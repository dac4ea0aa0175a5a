from pldepth_tpu.serve.export import export_predict, load_exported

__all__ = ["export_predict", "load_exported"]
