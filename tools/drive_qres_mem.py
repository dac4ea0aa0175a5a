"""Compile-only probe: peak-memory effect of --qres vs --remat_encoder.

Prints XLA memory analysis (temp/argument/output bytes) for the train
step under base / qres=int8 / remat, headline config. Run from the repo
root: python -u tools/drive_qres_mem.py [model] [size] [batch]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def probe(tag, **over):
    from pldepth_tpu.core.config import ExperimentConfig
    from pldepth_tpu.data import BatchIterator, SyntheticDepthDataset
    from pldepth_tpu.train import Trainer

    model = sys.argv[1] if len(sys.argv) > 1 else "ff_effnet"
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 448
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    cfg = ExperimentConfig(
        model_name=model, input_size=size, batch_size=batch,
        ranking_size=5, rankings_per_image=100, sampling_type=1,
        freeze_encoder=True, initial_lr=1e-3, **over,
    )
    t = Trainer(cfg, steps_per_epoch=1)
    state = t.init_state()
    ds = SyntheticDepthDataset(n=batch, image_size=size, seed=0)
    it = BatchIterator(ds, batch, seed=0)
    b = t.shard_batch(next(it))
    it.close()
    comp = t.train_step.lower(state, b).compile()
    m = comp.memory_analysis()
    out = {"variant": tag}
    for k in ("temp_size_in_bytes", "argument_size_in_bytes",
              "output_size_in_bytes", "generated_code_size_in_bytes"):
        v = getattr(m, k, None)
        if v is not None:
            out[k.replace("_size_in_bytes", "_MB")] = round(v / 2**20, 1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    from pldepth_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    probe("base")
    probe("qres_int8", qres="int8")
    probe("remat", remat_encoder=True)
    probe("qres_int8+remat", qres="int8", remat_encoder=True)
