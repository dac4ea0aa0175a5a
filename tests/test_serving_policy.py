"""serving_mode: the one precedence policy for predict/serve graph flags.

Round-5 change pinned here: `--quantize auto` serves int8 for the
ff_effnet family but bn_fold float for ff_redweb — the structured-scenes
metric gate measured ordering degradation (ordinal/WHDR over budget) for
redweb's int8 graph that the smooth-synthetic gate had masked
(docs/BENCH.md "Scenes-gate re-run").
"""

from pldepth_tpu.train import Trainer


def test_auto_serves_int8_for_effnet_family():
    assert Trainer.serving_mode(False, True, "auto", "ff_effnet") == "quant"
    assert Trainer.serving_mode(False, True, "auto", "ff_effnet_b4") == "quant"
    assert Trainer.serving_mode(False, True, "auto", "ff_smoke") == "quant"


def test_auto_serves_bnfold_for_redweb():
    assert Trainer.serving_mode(False, True, "auto", "ff_redweb") == "bn_fold"


def test_explicit_int8_wins_everywhere():
    assert Trainer.serving_mode(False, True, "int8", "ff_redweb") == "quant"
    assert Trainer.serving_mode(True, True, "int8", "ff_effnet") == "quant"


def test_auto_respects_explicit_other_graphs():
    # user asked for the fused Pallas encoder
    assert Trainer.serving_mode(True, True, "auto", "ff_effnet") is True
    # user disabled bn_fold -> plain float graph
    assert Trainer.serving_mode(False, False, "auto", "ff_effnet") is False


def test_empty_quantize_is_never_quant():
    assert Trainer.serving_mode(False, True, "", "ff_effnet") == "bn_fold"
    assert Trainer.serving_mode(False, False, "", "ff_effnet") is False
