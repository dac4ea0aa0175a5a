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


def test_empty_items():
    assert run_pipeline([], lambda i: i, lambda x: x, lambda i, h: None) == 0
