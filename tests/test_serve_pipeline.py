"""serve/pipeline.py: stage composition, ordering, overlap, errors."""

import threading

import numpy as np
import pytest

from pldepth_tpu.serve.pipeline import run_pipeline


def test_results_match_serial():
    items = list(range(7))
    infer_order = []
    out = {}

    n = run_pipeline(
        items,
        decode=lambda i: np.full((2, 2), i, np.float32),
        infer=lambda x: (infer_order.append(int(x[0, 0])), x * 2)[1],
        write=lambda i, host: out.__setitem__(i, host.copy()),
    )
    assert n == 7
    assert infer_order == items  # device dispatch stays in item order
    for i in items:
        np.testing.assert_array_equal(out[i], np.full((2, 2), 2 * i, np.float32))


def test_stages_run_off_main_thread():
    main = threading.get_ident()
    seen = {"decode": set(), "infer": set(), "write": set()}

    run_pipeline(
        list(range(5)),
        decode=lambda i: (seen["decode"].add(threading.get_ident()), i)[1],
        infer=lambda x: (seen["infer"].add(threading.get_ident()), np.float32(x))[1],
        write=lambda i, h: seen["write"].add(threading.get_ident()),
    )
    assert main not in seen["decode"]  # read-ahead pool
    assert seen["infer"] == {main}  # dispatch from the caller's thread
    assert main not in seen["write"]  # writer pool


def test_write_exception_propagates():
    def write(i, host):
        if i == 2:
            raise RuntimeError("disk full")

    with pytest.raises(RuntimeError, match="disk full"):
        run_pipeline(
            list(range(4)),
            decode=lambda i: i,
            infer=lambda x: np.float32(x),
            write=write,
        )


def test_decode_exception_propagates():
    def decode(i):
        if i == 1:
            raise ValueError("bad image")
        return i

    with pytest.raises(ValueError, match="bad image"):
        run_pipeline(
            list(range(3)),
            decode=decode,
            infer=lambda x: np.float32(x),
            write=lambda i, h: None,
        )


def test_prior_item_lands_when_later_decode_fails():
    """Item i-1's already-inferred result must be written even when item i
    fails to decode — a poison file can't discard its predecessor."""
    written = {}

    def decode(i):
        if i == 2:
            raise ValueError("bad image")
        return i

    with pytest.raises(ValueError, match="bad image"):
        run_pipeline(
            [0, 1, 2, 3],
            decode=decode,
            infer=lambda x: np.float32(x),
            write=lambda i, h: written.__setitem__(i, float(h)),
        )
    assert written == {0: 0.0, 1: 1.0}


def test_write_queue_is_bounded():
    """The writer backlog stays bounded when writes are much slower than
    inference: the dispatch loop must throttle (each queued write pins a
    full host batch — unbounded, a 1 ms/image device vs tens-of-ms writes
    buffers the whole dataset in RAM)."""
    import time

    done: list = []
    done_at_infer: list = []

    def write(i, h):
        time.sleep(0.02)
        done.append(i)

    def infer(x):
        done_at_infer.append(len(done))
        return np.float32(x)

    run_pipeline(
        list(range(20)),
        decode=lambda i: i,
        infer=infer,
        write=write,
        writers=1,
    )
    assert sorted(done) == list(range(20))
    # with a 2-deep write queue, dispatching item 19 requires ~15 finished
    # writes; an unbounded queue would show ~0 here
    assert done_at_infer[-1] >= 13, done_at_infer


def test_empty_items():
    assert run_pipeline([], lambda i: i, lambda x: x, lambda i, h: None) == 0
