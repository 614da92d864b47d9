"""Weight transplant between reference-format torch state_dicts and the Flax
``MobileNetLRASPP3D`` parameter tree.

The reference checkpoints (``save_model`` writes ``lraspp.pth`` state_dicts,
reference ``deep_staple/utils/torch_utils.py:354-360``) use the module layout
of ``MobileNet_LRASPP_3D`` (``deep_staple/MobileNet_LR_ASPP_3D.py:261-270``):

  * ``backbone.{1..10}[.module].{0,1,3,4,6,7}.*`` — ten inverted-residual
    blocks behind an Identity at index 0; residual blocks wrap the Sequential
    in a ResBlock whose attribute is ``module`` (:118-124). Indices 0/3/6 are
    the expand/depthwise/project convs, 1/4/7 their BatchNorms.
  * ``aspp.convs.{0..5}.{0,1}.*`` + ``aspp.project.{0,1}.*`` (:88-114).
  * ``head.cbr.{0,1}.*``, ``head.scale.1.*``, ``head.low_classifier.*``,
    ``head.high_classifier.*`` (:21-53).
  * ``him_slice.* / lom_slice.*`` — *aliases* of the backbone tensors
    (:201-202 register the same modules twice); ignored here.

Conversion is pure numpy (no torch import needed): torch conv3d weights are
(O, I/groups, kD, kH, kW) and Flax kernels are (kD, kH, kW, I/groups, O).

This module closes SURVEY.md §7 build gate #2 ("load-converted torch weights
for logit-parity test"); the gate itself lives in ``tests/test_torch_parity.py``.
"""

from __future__ import annotations

import numpy as np

from .lraspp3d import MID_STRIDE, OUT_CHANNELS

# Residual wrapping per reference Backbone_3d (:151-154): (inc==outc) & stride 1.
_IN_CHANNELS = (1,) + OUT_CHANNELS[:-1]  # for in_num=1
_IS_RES = tuple(
    (_IN_CHANNELS[i] == OUT_CHANNELS[i]) and (MID_STRIDE[i] == 1) for i in range(10)
)
# (torch sequential conv idx, bn idx) for expand / depthwise / project.
_CONV_BN_IDX = ((0, 1), (3, 4), (6, 7))


def _np(x) -> np.ndarray:
    # torch CPU tensors implement __array__, so this covers tensors and arrays.
    # copy=True is load-bearing: np.asarray on a torch tensor returns a VIEW of
    # the tensor's storage, so in-place torch updates (optimizer steps, BN stat
    # advances) would silently mutate the converted Flax tree.
    return np.array(x, dtype=np.float32, copy=True)


def _conv_to_flax(w) -> np.ndarray:
    return np.transpose(_np(w), (2, 3, 4, 1, 0))


def _conv_to_torch(k: np.ndarray) -> np.ndarray:
    return np.transpose(np.asarray(k, np.float32), (4, 3, 0, 1, 2))


def _block_paths(c_idx: int):
    """(torch prefix, flax (segment, module)) for backbone block c_idx."""
    tprefix = f"backbone.{c_idx + 1}" + (".module" if _IS_RES[c_idx] else "")
    if c_idx < 2:
        return tprefix, ("him", f"InvertedResidual3D_{c_idx}")
    return tprefix, ("lom", f"InvertedResidual3D_{c_idx - 2}")


def _iter_convbn_pairs():
    """Yields (torch_conv_key_prefix, torch_bn_key_prefix, flax_path) where
    flax_path addresses a ConvBN module (tuple of tree keys)."""
    for c_idx in range(10):
        tprefix, (seg, mod) = _block_paths(c_idx)
        for j, (ci, bi) in enumerate(_CONV_BN_IDX):
            yield f"{tprefix}.{ci}", f"{tprefix}.{bi}", (seg, mod, f"ConvBN_{j}")
    for b in range(6):  # ASPP branches: 1x1, four dilated 3x3, pooling.
        yield f"aspp.convs.{b}.0", f"aspp.convs.{b}.1", ("aspp", f"ConvBN_{b}")
    yield "aspp.project.0", "aspp.project.1", ("aspp", "ConvBN_6")
    yield "head.cbr.0", "head.cbr.1", ("head", "ConvBN_0")


# Plain convs: torch key prefix -> (flax path, has_bias).
_PLAIN_CONVS = (
    ("head.scale.1", ("head", "Conv_0"), False),
    ("head.low_classifier", ("head", "Conv_1"), True),
    ("head.high_classifier", ("head", "Conv_2"), True),
)


def _set(tree: dict, path, leaf):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = leaf


def torch_state_dict_to_flax(state_dict) -> dict:
    """Reference-format torch state_dict -> Flax variables
    ``{"params": ..., "batch_stats": ...}`` for ``MobileNetLRASPP3D``.

    Accepts torch tensors or numpy arrays as values; alias keys
    (``him_slice.* / lom_slice.*``) and ``num_batches_tracked`` are ignored.
    """
    params: dict = {}
    stats: dict = {}
    for conv_k, bn_k, fpath in _iter_convbn_pairs():
        _set(params, fpath + ("Conv_0", "kernel"), _conv_to_flax(state_dict[f"{conv_k}.weight"]))
        _set(params, fpath + ("BatchNorm_0", "scale"), _np(state_dict[f"{bn_k}.weight"]))
        _set(params, fpath + ("BatchNorm_0", "bias"), _np(state_dict[f"{bn_k}.bias"]))
        _set(stats, fpath + ("BatchNorm_0", "mean"), _np(state_dict[f"{bn_k}.running_mean"]))
        _set(stats, fpath + ("BatchNorm_0", "var"), _np(state_dict[f"{bn_k}.running_var"]))
    for conv_k, fpath, has_bias in _PLAIN_CONVS:
        _set(params, fpath + ("kernel",), _conv_to_flax(state_dict[f"{conv_k}.weight"]))
        if has_bias:
            _set(params, fpath + ("bias",), _np(state_dict[f"{conv_k}.bias"]))
    return {"params": params, "batch_stats": stats}


def _get(tree, path):
    node = tree
    for k in path:
        node = node[k]
    return np.asarray(node)


# --------------------------------------------------------------------------
# 2D path: torchvision `lraspp_mobilenet_v3_large` key layout
# (the reference's 2D model, `main_deep_staple.py:386-394`) <-> Flax
# `LRASPPMobileNetV3Large2D`.
# --------------------------------------------------------------------------


def _conv2d_to_flax(w) -> np.ndarray:
    return np.transpose(_np(w), (2, 3, 1, 0))


def _conv2d_to_torch(k: np.ndarray) -> np.ndarray:
    return np.transpose(np.asarray(k, np.float32), (3, 2, 0, 1))


def _iter_2d_modules():
    """Yields ('convbn', torch_conv_prefix, torch_bn_prefix, flax_path) and
    ('conv', torch_prefix, flax_path, has_bias) and
    ('se', torch_prefix, flax_path) entries covering the full model."""
    from .lraspp2d import _V3_LARGE_CFG

    yield ("convbn", "backbone.0.0", "backbone.0.1", ("ConvBN2D_0",))
    inc = 16
    for i, (_k, expanded, out, use_se, _act, _s, _d) in enumerate(_V3_LARGE_CFG):
        t = f"backbone.{i + 1}.block"
        f = f"InvertedResidual2D_{i}"
        j = 0  # torch sequential index; flax ConvBN2D index tracks it
        fj = 0
        if expanded != inc:
            yield ("convbn", f"{t}.{j}.0", f"{t}.{j}.1", (f, f"ConvBN2D_{fj}"))
            j += 1
            fj += 1
        yield ("convbn", f"{t}.{j}.0", f"{t}.{j}.1", (f, f"ConvBN2D_{fj}"))  # dw
        j += 1
        fj += 1
        if use_se:
            yield ("se", f"{t}.{j}", (f, "SqueezeExcite_0"))
            j += 1
        yield ("convbn", f"{t}.{j}.0", f"{t}.{j}.1", (f, f"ConvBN2D_{fj}"))  # proj
        inc = out
    yield ("convbn", "backbone.16.0", "backbone.16.1", ("ConvBN2D_1",))
    yield ("convbn", "classifier.cbr.0", "classifier.cbr.1", ("ConvBN2D_2",))
    yield ("conv", "classifier.scale.1", ("Conv_0",), False)
    yield ("conv", "classifier.low_classifier", ("Conv_1",), True)
    yield ("conv", "classifier.high_classifier", ("Conv_2",), True)


def torchvision_lraspp2d_to_flax(state_dict) -> dict:
    """torchvision-format `lraspp_mobilenet_v3_large` state_dict -> Flax
    variables for `LRASPPMobileNetV3Large2D`. Accepts torch tensors or numpy
    arrays; `num_batches_tracked` is ignored."""
    params: dict = {}
    stats: dict = {}
    for entry in _iter_2d_modules():
        if entry[0] == "convbn":
            _, conv_k, bn_k, fpath = entry
            _set(params, fpath + ("Conv_0", "kernel"), _conv2d_to_flax(state_dict[f"{conv_k}.weight"]))
            _set(params, fpath + ("BatchNorm_0", "scale"), _np(state_dict[f"{bn_k}.weight"]))
            _set(params, fpath + ("BatchNorm_0", "bias"), _np(state_dict[f"{bn_k}.bias"]))
            _set(stats, fpath + ("BatchNorm_0", "mean"), _np(state_dict[f"{bn_k}.running_mean"]))
            _set(stats, fpath + ("BatchNorm_0", "var"), _np(state_dict[f"{bn_k}.running_var"]))
        elif entry[0] == "se":
            _, t, fpath = entry
            for fc, fconv in (("fc1", "Conv_0"), ("fc2", "Conv_1")):
                _set(params, fpath + (fconv, "kernel"), _conv2d_to_flax(state_dict[f"{t}.{fc}.weight"]))
                _set(params, fpath + (fconv, "bias"), _np(state_dict[f"{t}.{fc}.bias"]))
        else:
            _, conv_k, fpath, has_bias = entry
            _set(params, fpath + ("kernel",), _conv2d_to_flax(state_dict[f"{conv_k}.weight"]))
            if has_bias:
                _set(params, fpath + ("bias",), _np(state_dict[f"{conv_k}.bias"]))
    return {"params": params, "batch_stats": stats}


def flax_lraspp2d_to_torchvision(variables) -> dict:
    """Inverse of :func:`torchvision_lraspp2d_to_flax` (numpy values)."""
    params, stats = variables["params"], variables["batch_stats"]
    sd: dict = {}
    for entry in _iter_2d_modules():
        if entry[0] == "convbn":
            _, conv_k, bn_k, fpath = entry
            sd[f"{conv_k}.weight"] = _conv2d_to_torch(_get(params, fpath + ("Conv_0", "kernel")))
            sd[f"{bn_k}.weight"] = _get(params, fpath + ("BatchNorm_0", "scale"))
            sd[f"{bn_k}.bias"] = _get(params, fpath + ("BatchNorm_0", "bias"))
            sd[f"{bn_k}.running_mean"] = _get(stats, fpath + ("BatchNorm_0", "mean"))
            sd[f"{bn_k}.running_var"] = _get(stats, fpath + ("BatchNorm_0", "var"))
        elif entry[0] == "se":
            _, t, fpath = entry
            for fc, fconv in (("fc1", "Conv_0"), ("fc2", "Conv_1")):
                sd[f"{t}.{fc}.weight"] = _conv2d_to_torch(_get(params, fpath + (fconv, "kernel")))
                sd[f"{t}.{fc}.bias"] = _get(params, fpath + (fconv, "bias"))
        else:
            _, conv_k, fpath, has_bias = entry
            sd[f"{conv_k}.weight"] = _conv2d_to_torch(_get(params, fpath + ("kernel",)))
            if has_bias:
                sd[f"{conv_k}.bias"] = _get(params, fpath + ("bias",))
    return sd


def flax_variables_to_torch_state_dict(variables) -> dict:
    """Flax ``{"params", "batch_stats"}`` -> reference-format numpy state_dict
    (the inverse of :func:`torch_state_dict_to_flax`; wrap values in
    ``torch.tensor`` to ``load_state_dict(..., strict=False)`` into the
    reference model — strict=False because of the him/lom alias keys)."""
    params, stats = variables["params"], variables["batch_stats"]
    sd: dict = {}
    for conv_k, bn_k, fpath in _iter_convbn_pairs():
        sd[f"{conv_k}.weight"] = _conv_to_torch(_get(params, fpath + ("Conv_0", "kernel")))
        sd[f"{bn_k}.weight"] = _get(params, fpath + ("BatchNorm_0", "scale"))
        sd[f"{bn_k}.bias"] = _get(params, fpath + ("BatchNorm_0", "bias"))
        sd[f"{bn_k}.running_mean"] = _get(stats, fpath + ("BatchNorm_0", "mean"))
        sd[f"{bn_k}.running_var"] = _get(stats, fpath + ("BatchNorm_0", "var"))
    for conv_k, fpath, has_bias in _PLAIN_CONVS:
        sd[f"{conv_k}.weight"] = _conv_to_torch(_get(params, fpath + ("kernel",)))
        if has_bias:
            sd[f"{conv_k}.bias"] = _get(params, fpath + ("bias",))
    return sd
