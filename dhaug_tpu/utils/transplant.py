"""Torch->flax posenet weight transplant: evaluate reference checkpoints.

The reference ecosystem's released artifact is a torch ``ckpt_*.pth.tar``
holding a posenet ``state_dict`` (saved at
DH-AUG_master/utils/utils.py:129-134; run_Fk_GAN.py:176,181 stores the
weights under 'model_pos', run_baseline.py:64 under 'state_dict', and
run_evaluate.py:30-31 loads them back).  This module maps such a state_dict
onto dhaug_tpu's flax parameter trees for all five posenets, so a user
holding real DH-AUG weights can score them with this framework
(``run_evaluate.py --evaluate ckpt_best.pth.tar``).

The name-based mappings below are the production twins of the module-based
transplanters in tests/test_reference_parity.py, which pin every one of
them to the executed reference forward passes (<=1e-5); a dedicated test
asserts this module produces bitwise the same trees as those transplanters.

torch is an optional import: it is only needed inside
``load_torch_checkpoint``, and only when a ``.pth(.tar)`` checkpoint is
actually being loaded.
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

__all__ = ["load_torch_checkpoint", "is_torch_checkpoint",
           "transplant_posenet_state_dict"]


def is_torch_checkpoint(path: str) -> bool:
    """Reference checkpoints are ``ckpt_<suffix>.pth.tar`` (utils.py:134)."""
    return path.endswith((".pth.tar", ".pth"))


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a reference ``.pth.tar`` and return the posenet state_dict as
    {name: float32 ndarray}.  Handles BOTH key layouts the reference writes:
    'state_dict' (run_baseline.py:64) and 'model_pos' (run_Fk_GAN.py:176) —
    the reference's own run_evaluate.py crashes on the latter (SURVEY §2.2).
    """
    try:
        import torch
    except ImportError as exc:  # pragma: no cover - torch is baked in here
        raise RuntimeError(
            "evaluating a .pth.tar reference checkpoint requires torch "
            "(pip install torch, CPU build is enough)") from exc
    ckpt = torch.load(path, map_location="cpu")
    state = ckpt.get("state_dict", ckpt.get("model_pos", ckpt))
    out = {}
    for name, tensor in state.items():
        if name.endswith("num_batches_tracked"):
            continue  # torch BN bookkeeping; our BN has no counter
        arr = np.array(tensor.detach().cpu().numpy(), copy=True)
        out[name] = arr.astype(np.float32) if arr.dtype == np.float64 else arr
    return out


def _as_np(tree):
    """Deep-copy a (possibly frozen) flax tree into plain nested dicts of
    numpy arrays so the fill-in below can assign leaves."""
    if isinstance(tree, dict) or hasattr(tree, "items"):
        return {k: _as_np(v) for k, v in tree.items()}
    return np.asarray(tree)


class _Filler:
    """Tracks which state_dict entries were consumed and shape-checks every
    assignment, so a wrong --posenet_name/--stages/--architecture fails
    loudly instead of evaluating garbage."""

    def __init__(self, state: Dict[str, np.ndarray]):
        self.state = state
        self.used = set()

    def take(self, name: str) -> np.ndarray:
        if name not in self.state:
            raise KeyError(
                f"reference checkpoint is missing '{name}' — wrong "
                "--posenet_name / --stages / --architecture for this file? "
                f"(has {len(self.state)} tensors, e.g. "
                f"{sorted(self.state)[:4]})")
        self.used.add(name)
        return self.state[name]

    def put(self, leaf: dict, key: str, value: np.ndarray):
        old = leaf[key]
        if np.shape(old) != np.shape(value):
            raise ValueError(
                f"shape mismatch filling '{key}': checkpoint {value.shape} "
                f"vs model {np.shape(old)} — wrong model dims for this "
                "checkpoint")
        leaf[key] = np.ascontiguousarray(value, dtype=np.float32)

    def linear(self, prefix: str, leaf: dict):
        """torch nn.Linear -> flax Dense (kernel is the transpose)."""
        self.put(leaf, "kernel", self.take(f"{prefix}.weight").T)
        self.put(leaf, "bias", self.take(f"{prefix}.bias"))

    def conv1d(self, prefix: str, leaf: dict):
        """torch Conv1d (C_out, C_in, k) -> flax Conv kernel (k, C_in, C_out)."""
        self.put(leaf, "kernel",
                 self.take(f"{prefix}.weight").transpose(2, 1, 0))
        if f"{prefix}.bias" in self.state:
            self.put(leaf, "bias", self.take(f"{prefix}.bias"))

    def bn(self, prefix: str, params_leaf: dict, stats_leaf: dict):
        self.put(params_leaf, "scale", self.take(f"{prefix}.weight"))
        self.put(params_leaf, "bias", self.take(f"{prefix}.bias"))
        self.put(stats_leaf, "mean", self.take(f"{prefix}.running_mean"))
        self.put(stats_leaf, "var", self.take(f"{prefix}.running_var"))

    def ln(self, prefix: str, leaf: dict):
        self.put(leaf, "scale", self.take(f"{prefix}.weight"))
        self.put(leaf, "bias", self.take(f"{prefix}.bias"))

    def finish(self):
        unused = sorted(set(self.state) - self.used)
        if unused:
            raise ValueError(
                f"{len(unused)} checkpoint tensors were not consumed "
                f"(first few: {unused[:6]}) — model/checkpoint mismatch")


def _fill_mlp(f: _Filler, params: dict, stats: dict):
    """Martinez LinearModel (models_baseline/mlp/linear_model.py:47):
    w1 -> BN -> num_stage x (w1,BN,w2,BN) residual stages -> w2."""
    f.linear("w1", params["Dense_0"])
    f.bn("batch_norm1", params["BatchNorm_0"], stats["BatchNorm_0"])
    n_stages = len([k for k in params if k.startswith("_LinearStage_")])
    for s in range(n_stages):
        p, st = params[f"_LinearStage_{s}"], stats[f"_LinearStage_{s}"]
        f.linear(f"linear_stages.{s}.w1", p["Dense_0"])
        f.bn(f"linear_stages.{s}.batch_norm1", p["BatchNorm_0"],
             st["BatchNorm_0"])
        f.linear(f"linear_stages.{s}.w2", p["Dense_1"])
        f.bn(f"linear_stages.{s}.batch_norm2", p["BatchNorm_1"],
             st["BatchNorm_1"])
    f.linear("w2", params["Dense_1"])


def _fill_temporal(f: _Filler, params: dict, stats: dict):
    """VideoPose conv stacks — TemporalModelOptimized1f
    (model_VideoPose3D.py:163) and the multiFrame twins
    (mulit_farme_videopose.py:74,136) share the same attribute layout:
    expand_conv/expand_bn, layers_conv[2i]/[2i+1] + layers_bn, shrink.
    Saved weights come from the strided TRAIN net; the dilated eval twin
    loads the identical state_dict (model_pos_preparation.py:42-50)."""
    f.conv1d("expand_conv", params["expand_conv"])
    f.bn("expand_bn", params["expand_bn"], stats["expand_bn"])
    n_blocks = len([k for k in params if k.startswith("conv_")
                    and k.endswith("a")])
    for i in range(n_blocks):
        f.conv1d(f"layers_conv.{2 * i}", params[f"conv_{i}a"])
        f.bn(f"layers_bn.{2 * i}", params[f"bn_{i}a"], stats[f"bn_{i}a"])
        f.conv1d(f"layers_conv.{2 * i + 1}", params[f"conv_{i}b"])
        f.bn(f"layers_bn.{2 * i + 1}", params[f"bn_{i}b"], stats[f"bn_{i}b"])
    f.conv1d("shrink", params["shrink"])


def _fill_semgcn(f: _Filler, params: dict, stats: dict):
    """SemGCN (models_baseline/gcn/sem_gcn.py:66): gconv_input Sequential,
    num_layers residual blocks each with gconv1/gconv2, gconv_output."""

    def gconv(prefix: str, leaf: dict):
        f.put(leaf, "W", f.take(f"{prefix}.W"))
        f.put(leaf, "e", f.take(f"{prefix}.e").reshape(-1))
        f.put(leaf, "bias", f.take(f"{prefix}.bias"))

    def block(prefix: str, p_leaf: dict, s_leaf: dict):
        gconv(f"{prefix}.gconv", p_leaf["SemGraphConv_0"])
        f.bn(f"{prefix}.bn", p_leaf["BatchNorm_0"], s_leaf["BatchNorm_0"])

    block("gconv_input.0", params["_GraphConvBlock_0"],
          stats["_GraphConvBlock_0"])
    n_blocks = len([k for k in params if k.startswith("_GraphConvBlock_")])
    n_layers = (n_blocks - 1) // 2
    idx = 1
    for i in range(n_layers):
        for g in ("gconv1", "gconv2"):
            block(f"gconv_layers.{i}.{g}", params[f"_GraphConvBlock_{idx}"],
                  stats[f"_GraphConvBlock_{idx}"])
            idx += 1
    gconv("gconv_output", params["SemGraphConv_0"])


def _fill_poseformer(f: _Filler, params: dict, stats: dict):
    """PoseTransformer (models_baseline/poseformer/model_poseformer.py:85):
    spatial patch embed + per-frame spatial blocks, temporal blocks,
    weighted-mean Conv1d over frames, LayerNorm+Linear head."""
    del stats  # no BatchNorm in PoseFormer

    def mha_block(prefix: str, leaf: dict):
        mha = leaf["MultiHeadDotProductAttention_0"]
        dim, heads, hd = np.shape(mha["query"]["kernel"])
        f.ln(f"{prefix}.norm1", leaf["LayerNorm_0"])
        w = f.take(f"{prefix}.attn.qkv.weight")          # (3C, C)
        b = f.take(f"{prefix}.attn.qkv.bias")            # (3C,)
        for i, name in enumerate(("query", "key", "value")):
            f.put(mha[name], "kernel",
                  w[i * dim:(i + 1) * dim].T.reshape(dim, heads, hd))
            f.put(mha[name], "bias",
                  b[i * dim:(i + 1) * dim].reshape(heads, hd))
        wp = f.take(f"{prefix}.attn.proj.weight")        # (C, C)
        f.put(mha["out"], "kernel", wp.T.reshape(heads, hd, dim))
        f.put(mha["out"], "bias", f.take(f"{prefix}.attn.proj.bias"))
        f.ln(f"{prefix}.norm2", leaf["LayerNorm_1"])
        f.linear(f"{prefix}.mlp.fc1", leaf["Dense_0"])
        f.linear(f"{prefix}.mlp.fc2", leaf["Dense_1"])

    f.linear("Spatial_patch_to_embedding", params["patch_embed"])
    f.put(params, "spatial_pos_embed", f.take("Spatial_pos_embed"))
    f.put(params, "temporal_pos_embed", f.take("Temporal_pos_embed"))
    n_blocks = len([k for k in params if k.startswith("_MHABlock_")])
    depth = n_blocks // 2
    for i in range(depth):
        mha_block(f"Spatial_blocks.{i}", params[f"_MHABlock_{i}"])
        mha_block(f"blocks.{i}", params[f"_MHABlock_{depth + i}"])
    f.ln("Spatial_norm", params["spatial_norm"])
    f.ln("Temporal_norm", params["temporal_norm"])
    # weighted_mean Conv1d(F, 1, 1): weight (1, F, 1) -> (F, 1)
    f.put(params, "frame_weights", f.take("weighted_mean.weight")[0])
    f.put(params, "frame_bias", f.take("weighted_mean.bias"))
    f.ln("head.0", params["LayerNorm_0"])
    f.linear("head.1", params["head"])


_FILLERS = {
    "mlp": _fill_mlp,
    "videopose": _fill_temporal,
    "mulit_farme_videopose": _fill_temporal,
    "gcn": _fill_semgcn,
    "mulit_farme_poseformer": _fill_poseformer,
}


def transplant_posenet_state_dict(posenet_name: str,
                                  state_dict: Dict[str, np.ndarray],
                                  params, batch_stats) -> Tuple[dict, dict]:
    """Map a reference torch ``state_dict`` onto freshly-initialized flax
    trees for ``posenet_name`` (the same five names as --posenet_name).
    Returns new (params, batch_stats); inputs are not mutated.  Every
    checkpoint tensor must be consumed and every shape must match, so a
    model/checkpoint mismatch raises instead of silently mis-scoring."""
    if posenet_name not in _FILLERS:
        raise ValueError(f"unknown posenet '{posenet_name}' "
                         f"(expected one of {sorted(_FILLERS)})")
    params = _as_np(params)
    batch_stats = _as_np(batch_stats) if batch_stats else {}
    f = _Filler(state_dict)
    _FILLERS[posenet_name](f, params, batch_stats)
    f.finish()
    return params, batch_stats
