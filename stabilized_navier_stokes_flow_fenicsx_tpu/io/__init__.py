from .xdmf import write_xdmf_function, read_xdmf_function
from .metadata import make_output_folder, write_run_metadata
