from pldepth_tpu.sweep.search_spaces import SEARCH_SPACES
from pldepth_tpu.sweep.sweep import run_sweep

__all__ = ["SEARCH_SPACES", "run_sweep"]
