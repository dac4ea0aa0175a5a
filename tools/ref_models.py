"""Import the reference (TF/Keras) PLDepth model code for golden generation.

The reference at /root/reference targets TF2.x with the legacy
``tensorflow.python.keras`` package paths, which TF 2.21 (Keras 3) no longer
ships, and imports mlflow / tensorflow_ranking which aren't installed. This
module installs minimal import shims (public keras.applications aliased under
the dead private path, an inert mlflow stub) so the *actual reference model
code* (pldepth/models/pl_hourglass.py, pldepth/models/redweb.py,
pldepth/data/depth_utils.py) builds its graphs here — used only offline by
tools/full_parity_check.py to produce cross-framework goldens; nothing in the
package imports this.
"""

from __future__ import annotations

import sys
import types

REFERENCE_ROOT = "/root/reference"


def install_shims() -> None:
    if "mlflow" not in sys.modules:
        m = types.ModuleType("mlflow")
        m.log_param = lambda *a, **k: None
        m.active_run = lambda: None
        m.set_tracking_uri = lambda *a, **k: None
        sys.modules["mlflow"] = m

    def _no_imagenet(fn):
        # The reference builds encoders with the default weights="imagenet"
        # (pl_hourglass.py:48, redweb.py:410) which downloads from GCS; this
        # image has no egress, and the goldens overwrite every weight with
        # deterministic values anyway — force random init.
        def wrapped(*args, **kwargs):
            kwargs["weights"] = None
            return fn(*args, **kwargs)

        return wrapped

    try:
        import tensorflow.python.keras.applications.efficientnet  # noqa: F401
    except ImportError:
        import keras.applications.efficientnet as _eff
        import tensorflow.python.keras as _tpk

        app = types.ModuleType("tensorflow.python.keras.applications")
        eff = types.ModuleType("tensorflow.python.keras.applications.efficientnet")
        for sym in ("EfficientNetB0", "EfficientNetB5"):
            setattr(eff, sym, _no_imagenet(getattr(_eff, sym)))
        eff.preprocess_input = _eff.preprocess_input
        app.efficientnet = eff
        sys.modules["tensorflow.python.keras.applications"] = app
        sys.modules["tensorflow.python.keras.applications.efficientnet"] = eff
        _tpk.applications = app

    if "tensorflow.keras.applications.resnet50" not in sys.modules:
        import keras.applications.resnet50 as _rn

        rn = types.ModuleType("tensorflow.keras.applications.resnet50")
        rn.ResNet50 = _no_imagenet(_rn.ResNet50)
        rn.preprocess_input = _rn.preprocess_input
        sys.modules["tensorflow.keras.applications.resnet50"] = rn

    import keras

    if not getattr(keras.layers.Conv2D, "_pldepth_float_filters_shim", False):
        # redweb.py builds Conv2D(in_out_planes / 4, ...) with FLOAT filter
        # counts (e.g. 64.0); Keras 2 coerced these, Keras 3 rejects them.
        # Re-create the Keras 2 coercion so the reference code runs unchanged.
        _orig_init = keras.layers.Conv2D.__init__

        def _coercing_init(self, filters, *args, **kwargs):
            _orig_init(self, int(filters), *args, **kwargs)

        keras.layers.Conv2D.__init__ = _coercing_init
        keras.layers.Conv2D._pldepth_float_filters_shim = True

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)


def build_reference_model(model_name: str, input_size: int, ranking_size: int = 5):
    """Build the reference Keras graph via the reference's own model code.

    Returns (keras_model, preprocess_fn) exactly as the reference factory
    does (pldepth/models/PLDepthNet.py:6-21).
    """
    install_shims()
    if model_name == "ff_effnet":
        from pldepth.models.pl_hourglass import EffNetFullyFledged

        return EffNetFullyFledged.get_model_and_normalization(
            (input_size, input_size, 3), ranking_size
        )
    if model_name == "ff_redweb":
        from pldepth.models.redweb import ReDWebNetTFVersion

        return ReDWebNetTFVersion.get_model_and_normalization(
            (input_size, input_size, 3), ranking_size
        )
    raise ValueError(f"unknown reference model {model_name}")


def zero_dropout(keras_model) -> int:
    """Set every Dropout layer's rate to 0 (EfficientNet stochastic depth),
    so train-mode forwards are deterministic and comparable across
    frameworks. Returns the number of layers touched."""
    import keras

    n = 0
    for layer in keras_model.layers:
        if isinstance(layer, keras.layers.Dropout):
            layer.rate = 0.0
            n += 1
    return n
