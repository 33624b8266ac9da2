from .linalg import inv_small, det_small, solve_dense_qr
