"""CLI entry points (reference argv contracts).

Importing the apps package enables JAX's persistent compilation cache
(unless the user already configured one): the production sweeps
(run_all_RE.sh semantics) run one process per case, and the fine-mesh
Newton programs cost minutes to compile — cached, repeat cases start
hot.  Library users importing the core packages directly are not
affected.
"""

import os

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.expanduser("~"), ".cache", "snsf_tpu_jax"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
