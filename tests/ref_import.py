"""Import the upstream reference (read-only) for execution-level parity tests.

The reference at /root/reference/DH-AUG_master is PyTorch + NumPy and mostly
importable on CPU, but several modules have import-time side effects that do
not work headless in this container:

  * ``matplotlib.use("Qt5Agg")`` at the top of forward_kinematics_DH_model.py
    (PyQt5 is not installed) — we force Agg and no-op ``matplotlib.use`` for
    the duration of the import.
  * ``import thop`` / ``import loguru`` (not installed, and unused by the math
    we exercise) — stubbed with empty modules.
  * ``import timm`` (not installed) — models_baseline/poseformer/
    model_poseformer.py needs DropPath / trunc_normal_ / to_2tuple /
    load_pretrained / register_model and two constants; stubbed with
    behaviour-exact equivalents (DropPath is identity in eval mode and at
    drop_prob=0, which is all the parity tests exercise; the training-mode
    branch implements the standard stochastic-depth formula).

Nothing is copied: the reference directory is appended to ``sys.path`` and the
original modules execute in place.  Tests using this helper skip when the
reference tree is absent.
"""
from __future__ import annotations

import os
import sys
import types

REFERENCE_ROOT = "/root/reference/DH-AUG_master"

_cache = None


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_ROOT)


def _stub_module(name: str, **attrs):
    if name in sys.modules:
        return
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod


class _SilentLogger:
    def __getattr__(self, _name):
        return lambda *a, **k: None


def _stub_timm():
    """Stub the timm surface model_poseformer.py imports (timm itself is not
    installed in this image).  DropPath follows the standard stochastic-depth
    formula (identity in eval / at drop_prob=0 — the only modes the parity
    tests run)."""
    if "timm" in sys.modules:
        return
    import torch

    class DropPath(torch.nn.Module):
        def __init__(self, drop_prob=None):
            super().__init__()
            self.drop_prob = drop_prob or 0.0

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1.0 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = keep + torch.rand(shape, dtype=x.dtype, device=x.device)
            mask.floor_()
            return x.div(keep) * mask

    def to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    _stub_module("timm")
    _stub_module("timm.data",
                 IMAGENET_DEFAULT_MEAN=(0.485, 0.456, 0.406),
                 IMAGENET_DEFAULT_STD=(0.229, 0.224, 0.225))
    _stub_module("timm.models")
    _stub_module("timm.models.helpers",
                 load_pretrained=lambda *a, **k: None)
    _stub_module("timm.models.layers",
                 DropPath=DropPath, to_2tuple=to_2tuple,
                 trunc_normal_=torch.nn.init.trunc_normal_)
    _stub_module("timm.models.registry",
                 register_model=lambda fn: fn)


def load_reference():
    """Import and cache the reference modules needed for parity checks.

    Returns a namespace object with attributes:
      fk        models_Fk_GAN.forward_kinematics_DH_model
      camera    common.camera
      loss      utils.loss
      gan_utils utils.gan_utils
      disc      models_Fk_GAN.Fk_discriminator
      gen       models_Fk_GAN.Fk_generator
      quaternion common.quaternion
    """
    global _cache
    if _cache is not None:
        return _cache
    if not reference_available():
        raise RuntimeError(f"reference tree not found at {REFERENCE_ROOT}")

    # Append (not prepend) so the repo's own top-level modules always win.
    if REFERENCE_ROOT not in sys.path:
        sys.path.append(REFERENCE_ROOT)

    _stub_module("thop", profile=lambda *a, **k: (0.0, 0.0))
    _stub_module("loguru", logger=_SilentLogger())
    _stub_timm()

    import matplotlib
    from matplotlib.backends.backend_agg import FigureCanvasAgg

    # forward_kinematics_DH_model.py imports FigureCanvasQTAgg directly; the
    # Agg canvas is API-compatible for the non-interactive math we exercise.
    _stub_module("matplotlib.backends.backend_qt5agg",
                 FigureCanvasQTAgg=FigureCanvasAgg)

    matplotlib.use("Agg", force=True)
    orig_use = matplotlib.use
    matplotlib.use = lambda *a, **k: None  # reference calls use("Qt5Agg") at import
    try:
        import models_Fk_GAN.forward_kinematics_DH_model as ref_fk
        import models_Fk_GAN.Fk_discriminator as ref_disc
        import models_Fk_GAN.Fk_generator as ref_gen
        import models_Fk_GAN.model_fk_gan_train as ref_gan_train
        import models_baseline.poseformer.model_poseformer as ref_poseformer
        import common.camera as ref_camera
        import common.quaternion as ref_quaternion
        import utils.loss as ref_loss
        import utils.gan_utils as ref_gan_utils
    finally:
        matplotlib.use = orig_use

    ns = types.SimpleNamespace(
        fk=ref_fk,
        disc=ref_disc,
        gen=ref_gen,
        gan_train=ref_gan_train,
        poseformer=ref_poseformer,
        camera=ref_camera,
        quaternion=ref_quaternion,
        loss=ref_loss,
        gan_utils=ref_gan_utils,
        root=REFERENCE_ROOT,
    )
    _cache = ns
    return ns


def make_ref_args(batch_size: int = 8, mode: str = "single",
                  architecture: str = "3,3", random_seed: int = 0):
    """Minimal argparse-free namespace accepted by the reference FK class
    (forward_kinematics_DH_model.py:195-276 reads batch_size, random_seed,
    single_or_multi_train_mode, architecture)."""
    return types.SimpleNamespace(
        batch_size=batch_size,
        random_seed=random_seed,
        single_or_multi_train_mode=mode,
        architecture=architecture,
    )
