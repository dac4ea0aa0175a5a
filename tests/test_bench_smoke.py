"""bench.py end-to-end smoke on the CPU backend.

The driver runs `python bench.py` at the end of every round; a crash there
loses the round's headline measurement (a rebound `m` once turned the
loss_sample into a (scan_len,) vector and TypeError'd at the summary).
This runs the full main() — device chain, host pipeline, native packed
pipeline, resident + resident-chain benches, detail file, JSON line — at
smoke scale.
"""

import json
import os
import sys

import pytest

pytestmark = pytest.mark.slow


def test_bench_main_end_to_end(tmp_path, monkeypatch, capsys):
    detail_path = str(tmp_path / "detail.json")
    monkeypatch.setenv("BENCH_MODEL", "ff_smoke")
    monkeypatch.setenv("BENCH_IMAGE_SIZE", "64")
    # conftest's virtual mesh has 8 devices; the bench batch must divide
    monkeypatch.setenv("BENCH_BATCH", "8")
    monkeypatch.setenv("BENCH_SCAN", "2")
    monkeypatch.setenv("BENCH_K", "3")
    monkeypatch.setenv("BENCH_DETAIL", detail_path)
    # the CPU backend is already forced by conftest; BENCH_FORCE_CPU's
    # config update is a no-op here but keeps main()'s path realistic
    monkeypatch.setenv("BENCH_FORCE_CPU", "1")

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    bench.main()

    out = capsys.readouterr().out.strip().splitlines()
    line = json.loads(out[-1])
    assert line["unit"] == "images/sec/chip"
    assert line["value"] > 0
    # this smoke config runs K=3: it doesn't match the measured K=5 TF2-CPU
    # denominator, so the ratio must be null, not apples-to-oranges
    # (bench.py baseline_comparable)
    assert line["vs_baseline"] is None

    detail = json.loads(open(detail_path).read())
    assert detail["images_per_sec_device"] > 0
    # the resident benches must have produced numbers, not been skipped
    assert detail["images_per_sec_resident_data"] > 0
    # the chain figure is a 2-vs-4-dispatch chained difference; bench.py
    # deliberately nulls it when the single-sample delta is noise-negative
    # or implies an impossible rate (ADVICE r04) — at CPU smoke scale the
    # per-dispatch cost is tiny, so the noise guard legitimately fires
    rc = detail["images_per_sec_resident_chain"]
    assert rc is None or rc > 0
    # loss_sample samples the single train step (a scalar, not the chain)
    assert isinstance(detail["loss_sample"], float)
