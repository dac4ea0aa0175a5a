"""Three-stage serving pipeline: host decode ∥ device compute ∥ host write.

The reference's closest path runs one image at a time through
``model.predict`` with decode and file IO serially in between
(pldepth/test_data_eval.py:30-108, pldepth/active_learning/
active_learning_method.py:101). At TPU serving rates (~1 ms/image @448²,
docs/BENCH.md) a serial loop is decode-bound: JPEG decode + resize costs
tens of ms per image on this class of host. This pipeline keeps the device
busy by overlapping the three stages:

- a bounded decode pool reads ahead ``prefetch`` batches,
- the main thread dispatches inference asynchronously (JAX dispatch returns
  before the device finishes) and only synchronizes batch *i-1* while batch
  *i* is computing — a 2-deep in-flight window, matching the dispatch bound
  the trainer uses (docs/BENCH.md methodology: bounded async depth), and
- a writer pool turns finished host arrays into output files.

Stage-agnostic: ``decode``/``infer``/``write`` are callables, so the same
pipeline serves files→depth-maps (cli predict), packed datasets, or any
other batch source.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Sequence

import numpy as np

__all__ = ["run_pipeline"]


def run_pipeline(
    items: Sequence[Any],
    decode: Callable[[Any], Any],
    infer: Callable[[Any], Any],
    write: Callable[[Any, np.ndarray], Any],
    *,
    prefetch: int = 3,
    writers: int = 2,
) -> int:
    """Run ``write(item, np.asarray(infer(decode(item))))`` for every item,
    overlapping the stages. Returns the number of items processed.

    ``infer`` runs on the caller's thread in item order (device dispatch
    order is deterministic); ``decode`` runs up to ``prefetch`` items ahead
    on a pool; ``write`` receives the host-materialized result on a writer
    pool. Exceptions from any stage propagate to the caller.
    """
    items = list(items)
    if not items:
        return 0
    with ThreadPoolExecutor(max(1, prefetch)) as dec_pool, ThreadPoolExecutor(
        max(1, writers)
    ) as wr_pool:
        dec_futs: dict[int, Any] = {}

        def read_ahead(i: int) -> None:
            for j in range(i, min(i + max(1, prefetch), len(items))):
                if j not in dec_futs:
                    dec_futs[j] = dec_pool.submit(decode, items[j])

        write_futs = []
        pending = None  # (item, in-flight device result)
        for i, item in enumerate(items):
            read_ahead(i)
            x = dec_futs.pop(i).result()
            out = infer(x)  # async dispatch; do not sync yet
            if pending is not None:
                p_item, p_out = pending
                host = np.asarray(p_out)  # sync i-1 while i computes
                write_futs.append(wr_pool.submit(write, p_item, host))
            pending = (item, out)
        p_item, p_out = pending
        write_futs.append(wr_pool.submit(write, p_item, np.asarray(p_out)))
        for f in write_futs:
            f.result()  # surface writer exceptions before returning
    return len(items)
