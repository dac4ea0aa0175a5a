from pldepth_tpu.serve.export import export_predict, load_exported
from pldepth_tpu.serve.pipeline import run_pipeline

__all__ = ["export_predict", "load_exported", "run_pipeline"]
