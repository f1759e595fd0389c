"""PyTorch -> flax checkpoint importer.

Fills the role of the reference loader (``models/utils/checkpoint.py:67-120``,
TCGGroup/Torch_Detection) for the JAX world: it maps a torchvision-style
``state_dict`` onto our flax variable trees, with the same tolerant-diff
reporting (missing / unexpected keys, ``checkpoint.py:29-64``) and the
``module.`` DataParallel prefix strip (``checkpoint.py:113-114``).

Layout conversions:
  * conv weights   OIHW  -> HWIO  (torch -> flax NHWC)
  * linear weights (O,I) -> (I,O)
  * BN: weight->scale, bias->bias (params); running_mean/var -> batch_stats.

Each backbone family ships a key-rule table (regex -> flax path); the default
table covers the torchvision ResNet naming that the reference deliberately
mirrors (``resnet.py:26-33``).
"""

from __future__ import annotations

import logging
import re
from typing import Dict, List, Mapping, Optional, Sequence, Tuple

import numpy as np

logger = logging.getLogger(__name__)

# (torch-key regex) -> (flax module path template). Applied in order; first
# match wins. Path separators are '/'.
RESNET_KEY_RULES: Sequence[Tuple[str, str]] = (
    (r"^conv1\.(.*)$", r"stem/conv.\1"),
    (r"^bn1\.(.*)$", r"stem/norm.\1"),
    (r"^layer(\d+)\.(\d+)\.conv(\d+)\.(.*)$", r"layer\1_\2/block\3/conv.\4"),
    (r"^layer(\d+)\.(\d+)\.bn(\d+)\.(.*)$", r"layer\1_\2/block\3/norm.\4"),
    (r"^layer(\d+)\.(\d+)\.downsample\.0\.(.*)$", r"layer\1_\2/downsample/conv.\3"),
    (r"^layer(\d+)\.(\d+)\.downsample\.1\.(.*)$", r"layer\1_\2/downsample/norm.\3"),
    # SENet-style se blocks (se_module.fc1 / se.fc1 variants)
    (r"^layer(\d+)\.(\d+)\.se(?:_module)?\.fc1\.(.*)$", r"layer\1_\2/se/fc1.\3"),
    (r"^layer(\d+)\.(\d+)\.se(?:_module)?\.fc2\.(.*)$", r"layer\1_\2/se/fc2.\3"),
    (r"^fc\.", None),  # classifier head: not part of the detection backbone
)


def vgg_key_rules(depth: int, with_norm: bool = False) -> Sequence[Tuple[str, Optional[str]]]:
    """Key rules for torchvision VGG state_dicts (``features.{i}.*``).

    torchvision's VGG flattens conv/relu/norm/pool into one Sequential; this
    reconstructs the per-stage indices for the given depth and maps them to
    our ``layer{s}_{j}`` naming (models/backbones/vgg.py).
    """
    arch = {
        11: (1, 1, 2, 2, 2),
        13: (2, 2, 2, 2, 2),
        16: (2, 2, 3, 3, 3),
        19: (2, 2, 4, 4, 4),
    }[depth]
    rules = []
    idx = 0
    for s, blocks in enumerate(arch):
        for j in range(blocks):
            rules.append((rf"^features\.{idx}\.(.*)$", rf"layer{s + 1}_{j}/conv.\1"))
            idx += 1  # conv
            if with_norm:
                rules.append((rf"^features\.{idx}\.(.*)$", rf"layer{s + 1}_{j}/norm.\1"))
                idx += 1  # norm
            idx += 1  # relu
        idx += 1  # maxpool
    rules.append((r"^classifier\.", None))
    return tuple(rules)


def mobilenetv2_key_rules(with_last_conv: bool = True) -> List[Tuple[str, Optional[str]]]:
    """Key rules for torchvision MobileNetV2 state_dicts.

    torchvision flattens the 17 inverted-residual blocks plus stem and the
    final 1x1 into ``features.{0..18}``; block sub-modules are
    ``conv.{j}.{0,1}`` ConvBNReLU pairs except the project conv/bn which are
    bare ``conv.{k}`` / ``conv.{k+1}`` (and block 1 has no expand).  Maps to
    our ``stem`` / ``layer{s}_{j}/{expand,dw,project}`` / ``last_conv``
    naming (models/backbones/mobilenet.py MobileNetV2).
    """
    stage_blocks = (1, 2, 3, 4, 3, 3, 1)  # MOBILENETV2_SETTINGS block counts
    rules: List[Tuple[str, Optional[str]]] = [
        (r"^features\.0\.0\.(.*)$", r"stem/conv.\1"),
        (r"^features\.0\.1\.(.*)$", r"stem/norm.\1"),
    ]
    feat = 1
    for s, blocks in enumerate(stage_blocks):
        for j in range(blocks):
            base = rf"^features\.{feat}\.conv\."
            name = f"layer{s + 1}_{j}"
            if feat == 1:  # expansion 1: no expand conv
                rules += [
                    (base + r"0\.0\.(.*)$", rf"{name}/dw/conv.\1"),
                    (base + r"0\.1\.(.*)$", rf"{name}/dw/norm.\1"),
                    (base + r"1\.(.*)$", rf"{name}/project/conv.\1"),
                    (base + r"2\.(.*)$", rf"{name}/project/norm.\1"),
                ]
            else:
                rules += [
                    (base + r"0\.0\.(.*)$", rf"{name}/expand/conv.\1"),
                    (base + r"0\.1\.(.*)$", rf"{name}/expand/norm.\1"),
                    (base + r"1\.0\.(.*)$", rf"{name}/dw/conv.\1"),
                    (base + r"1\.1\.(.*)$", rf"{name}/dw/norm.\1"),
                    (base + r"2\.(.*)$", rf"{name}/project/conv.\1"),
                    (base + r"3\.(.*)$", rf"{name}/project/norm.\1"),
                ]
            feat += 1
    if with_last_conv:
        rules += [
            (r"^features\.18\.0\.(.*)$", r"last_conv/conv.\1"),
            (r"^features\.18\.1\.(.*)$", r"last_conv/norm.\1"),
        ]
    else:  # detection backbones drop the classifier 1x1 -> 1280
        rules.append((r"^features\.18\.", None))
    rules.append((r"^classifier\.", None))
    return rules


def _fc_after_roi_transform(value: np.ndarray) -> np.ndarray:
    """Permute a torch FC weight that consumes flattened pooled RoI features
    from (C, S, S) input ordering to our NHWC (S, S, C) ordering.  The
    spatial size is inferred: in_features = C * S * S with square S — we try
    the common RoI sizes."""
    if value.ndim != 2:
        return value
    out_f, in_f = value.shape
    for s in (7, 14, 28):
        if in_f % (s * s) == 0:
            c = in_f // (s * s)
            return (
                value.reshape(out_f, c, s, s)
                .transpose(0, 2, 3, 1)
                .reshape(out_f, in_f)
            )
    return value


def prefixed_rules(
    rules: Sequence[Tuple[str, Optional[str]]], torch_prefix: str, flax_prefix: str
) -> List[Tuple[str, Optional[str]]]:
    """Re-anchor a rule table under a torch key prefix / flax path prefix
    (e.g. backbone rules inside a full-detector state_dict)."""
    out = []
    for pattern, repl in rules:
        assert pattern.startswith("^")
        new_pat = "^" + re.escape(torch_prefix) + pattern[1:]
        if repl is None:
            out.append((new_pat, None))
        elif callable(repl):
            out.append((new_pat, lambda m, r=repl: flax_prefix + r(m)))
        else:
            out.append((new_pat, flax_prefix + repl))
    return out


def fpn_key_rules(
    num_laterals: int,
    start_level: int = 0,
    torch_prefix: str = "neck.",
    flax_prefix: str = "neck/",
) -> List[Tuple[str, Optional[str]]]:
    """mmdetection FPN naming -> our flax FPN naming.

    mmdet: ``lateral_convs.{i}.conv`` and ``fpn_convs.{j}.conv`` where
    ``j < num_laterals`` are the 3x3 smoothing convs and ``j >= num_laterals``
    are the extra stride-2 levels.  Ours: ``lateral{start_level+i}``,
    ``fpn{j}``, ``extra{j-num_laterals}`` (models/necks/fpn.py).
    """
    p, f = re.escape(torch_prefix), flax_prefix

    def _lateral(m):
        return f"{flax_prefix}lateral{start_level + int(m.group(1))}/{m.group(2)}.{m.group(3)}"

    def _fpn(m):
        j = int(m.group(1))
        name = f"fpn{j}" if j < num_laterals else f"extra{j - num_laterals}"
        return f"{flax_prefix}{name}/{m.group(2)}.{m.group(3)}"

    return [
        (rf"^{p}lateral_convs\.(\d+)\.(conv|bn|norm|gn)\.(.*)$",
         lambda m: _lateral(m).replace("/bn.", "/norm.").replace("/gn.", "/norm.")),
        (rf"^{p}fpn_convs\.(\d+)\.(conv|bn|norm|gn)\.(.*)$",
         lambda m: _fpn(m).replace("/bn.", "/norm.").replace("/gn.", "/norm.")),
    ]


def retinanet_key_rules(
    num_laterals: int = 3, start_level: int = 0
) -> List[Tuple[str, Optional[str]]]:
    """Full-detector rules for mmdetection-style RetinaNet state_dicts:
    ``backbone.*`` (torchvision ResNet naming, reference resnet.py:26-33),
    ``neck.*`` (FPN), ``bbox_head.{cls,reg}_convs.{i}.conv`` towers and
    ``retina_cls``/``retina_reg`` output convs -> our
    backbone/neck/head flax scopes (models/detectors/single_stage.py).
    ``start_level`` offsets the flax lateral names and is 0 whenever the
    flax FPN receives pre-sliced inputs (our configs select C3-C5 via
    backbone out_indices, so laterals are named lateral0..)."""
    rules = prefixed_rules(RESNET_KEY_RULES, "backbone.", "backbone/")
    rules += fpn_key_rules(num_laterals, start_level)
    rules += [
        (r"^bbox_head\.cls_convs\.(\d+)\.conv\.(.*)$", r"head/cls_conv\1/conv.\2"),
        (r"^bbox_head\.reg_convs\.(\d+)\.conv\.(.*)$", r"head/reg_conv\1/conv.\2"),
        (r"^bbox_head\.cls_convs\.(\d+)\.(?:bn|norm|gn)\.(.*)$", r"head/cls_conv\1/norm.\2"),
        (r"^bbox_head\.reg_convs\.(\d+)\.(?:bn|norm|gn)\.(.*)$", r"head/reg_conv\1/norm.\2"),
        (r"^bbox_head\.retina_cls\.(.*)$", r"head/cls_out.\1"),
        (r"^bbox_head\.retina_reg\.(.*)$", r"head/reg_out.\1"),
    ]
    return rules


def faster_rcnn_key_rules(
    num_laterals: int = 4, start_level: int = 0
) -> List[Tuple[str, Optional[str]]]:
    """Full-detector rules for mmdetection-style Faster/Mask R-CNN
    state_dicts: ``rpn_head.rpn_{conv,cls,reg}``, shared-2fc
    ``bbox_head.shared_fcs.{0,1}`` + ``fc_cls``/``fc_reg``, and the mask
    head's ``mask_head.convs.{i}.conv`` / ``upsample`` / ``conv_logits``
    -> our rpn/bbox_head/mask_head flax scopes
    (models/detectors/two_stage.py, mask_rcnn.py)."""
    rules = prefixed_rules(RESNET_KEY_RULES, "backbone.", "backbone/")
    rules += fpn_key_rules(num_laterals, start_level)
    rules += [
        (r"^rpn_head\.rpn_conv\.(.*)$", r"rpn/rpn_conv.\1"),
        (r"^rpn_head\.rpn_cls\.(.*)$", r"rpn/rpn_cls.\1"),
        (r"^rpn_head\.rpn_reg\.(.*)$", r"rpn/rpn_reg.\1"),
        # torch flattens pooled RoIs (C,S,S); our NHWC head flattens (S,S,C)
        # -> permute fc1's input dimension accordingly (weight only)
        (r"^bbox_head\.shared_fcs\.0\.(.*)$", r"bbox_head/fc1.\1",
         _fc_after_roi_transform),
        (r"^bbox_head\.shared_fcs\.1\.(.*)$", r"bbox_head/fc2.\1"),
        (r"^bbox_head\.fc_cls\.(.*)$", r"bbox_head/cls.\1"),
        (r"^bbox_head\.fc_reg\.(.*)$", r"bbox_head/reg.\1"),
        (r"^mask_head\.convs\.(\d+)\.conv\.(.*)$", r"mask_head/conv\1.\2"),
        (r"^mask_head\.upsample\.(.*)$", r"mask_head/upsample.\1"),
        (r"^mask_head\.conv_logits\.(.*)$", r"mask_head/logits.\1"),
    ]
    return rules


def _to_numpy(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def strip_prefix(state_dict: Mapping[str, object], prefix: str = "module.") -> Dict[str, object]:
    """Drop a (D)DP wrapper prefix if every key carries it."""
    keys = list(state_dict)
    if keys and all(k.startswith(prefix) for k in keys):
        return {k[len(prefix):]: v for k, v in state_dict.items()}
    return dict(state_dict)


def _classify_leaf(flax_path: str, torch_leaf: str, value: np.ndarray):
    """Return (collection, path_tuple, converted_value) or None to skip."""
    parts = tuple(flax_path.split("/"))
    if torch_leaf == "weight":
        if value.ndim == 4 and parts[-1] == "upsample":
            # torch ConvTranspose2d weight is (I, O, kH, kW); flax
            # nn.ConvTranspose kernel is (kH, kW, I, O)
            return ("params", parts + ("kernel",), np.transpose(value, (2, 3, 0, 1)))
        if value.ndim == 4:  # conv OIHW -> HWIO
            return ("params", parts + ("kernel",), np.transpose(value, (2, 3, 1, 0)))
        if value.ndim == 2:  # linear (O, I) -> (I, O)
            return ("params", parts + ("kernel",), value.T)
        if value.ndim == 1:  # norm scale
            return ("params", parts + ("scale",), value)
    elif torch_leaf == "bias":
        return ("params", parts + ("bias",), value)
    elif torch_leaf == "running_mean":
        return ("batch_stats", parts + ("mean",), value)
    elif torch_leaf == "running_var":
        return ("batch_stats", parts + ("var",), value)
    elif torch_leaf == "num_batches_tracked":
        return None
    raise ValueError(f"cannot classify torch leaf {torch_leaf!r} at {flax_path!r} (ndim={value.ndim})")


def convert_state_dict(
    state_dict: Mapping[str, object],
    key_rules: Sequence[Tuple[str, Optional[str]]] = RESNET_KEY_RULES,
) -> Tuple[Dict[str, Dict], List[str]]:
    """Convert a torch state_dict into {'params': tree, 'batch_stats': tree}.

    Returns (variables, unexpected_keys): keys no rule matched are reported,
    not fatal — same tolerance contract as the reference loader.
    """
    state_dict = strip_prefix(state_dict)
    variables: Dict[str, Dict] = {"params": {}, "batch_stats": {}}
    unexpected: List[str] = []
    for key, raw in state_dict.items():
        mapped = None
        transform = None
        for rule in key_rules:
            pattern, repl = rule[0], rule[1]
            m = re.match(pattern, key)
            if m:
                transform = rule[2] if len(rule) > 2 else None
                if repl is None:
                    mapped = None
                elif callable(repl):  # index arithmetic regexes can't express
                    mapped = repl(m)
                else:
                    mapped = m.expand(repl)
                break
        else:
            unexpected.append(key)
            continue
        if mapped is None:
            continue
        flax_path, torch_leaf = mapped.rsplit(".", 1)
        value = _to_numpy(raw)
        if transform is not None and torch_leaf == "weight":
            value = transform(value)
        out = _classify_leaf(flax_path, torch_leaf, value)
        if out is None:
            continue
        collection, path, value = out
        node = variables[collection]
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value
    if not variables["batch_stats"]:
        variables.pop("batch_stats")
    return variables, unexpected


def _flatten(tree: Mapping, prefix: Tuple[str, ...] = ()) -> Dict[Tuple[str, ...], np.ndarray]:
    flat = {}
    for k, v in tree.items():
        if isinstance(v, Mapping):
            flat.update(_flatten(v, prefix + (k,)))
        else:
            flat[prefix + (k,)] = v
    return flat


def load_torch_weights(
    variables: Mapping[str, Mapping],
    state_dict: Mapping[str, object],
    key_rules: Sequence[Tuple[str, Optional[str]]] = RESNET_KEY_RULES,
    strict: bool = False,
    log: Optional[logging.Logger] = None,
) -> Dict[str, Dict]:
    """Graft torch weights onto an initialized flax variable tree.

    ``variables`` is the output of ``module.init(...)``; returns a new tree of
    the same structure with matching leaves replaced.  Missing / unexpected /
    shape-mismatched keys are collected and logged (raise iff ``strict``).
    """
    log = log or logger
    converted, unexpected = convert_state_dict(state_dict, key_rules)

    have = {c: _flatten(t) for c, t in variables.items()}
    incoming = {c: _flatten(t) for c, t in converted.items()}

    missing: List[str] = []
    mismatched: List[str] = []
    out = {c: dict(_flatten(t)) for c, t in variables.items()}

    for coll, flat in have.items():
        inc = incoming.get(coll, {})
        for path, value in flat.items():
            if path in inc:
                new = inc[path]
                if tuple(np.shape(new)) != tuple(np.shape(value)):
                    mismatched.append(f"{coll}:{'/'.join(path)} {np.shape(value)} vs torch {np.shape(new)}")
                else:
                    out[coll][path] = np.asarray(new, dtype=np.asarray(value).dtype)
            else:
                missing.append(f"{coll}:{'/'.join(path)}")
    extra = [
        f"{coll}:{'/'.join(p)}"
        for coll, inc in incoming.items()
        for p in inc
        if p not in have.get(coll, {})
    ]

    problems = []
    if missing:
        problems.append(f"missing keys (kept initialized): {sorted(missing)}")
    if unexpected or extra:
        problems.append(f"unexpected torch keys (ignored): {sorted(unexpected + extra)}")
    if mismatched:
        problems.append(f"shape mismatches (kept initialized): {sorted(mismatched)}")
    if problems:
        msg = "; ".join(problems)
        if strict:
            raise RuntimeError(msg)
        log.warning("torch import: %s", msg)

    # rebuild nested trees
    def unflatten(flat: Dict[Tuple[str, ...], np.ndarray]) -> Dict:
        tree: Dict = {}
        for path, v in flat.items():
            node = tree
            for p in path[:-1]:
                node = node.setdefault(p, {})
            node[path[-1]] = v
        return tree

    return {c: unflatten(f) for c, f in out.items()}


def load_torch_checkpoint(path: str):
    """Load a .pth/.pt file into a plain dict of numpy arrays (unwraps the
    ``{'state_dict': ...}`` envelope like reference checkpoint.py:104-111)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k: _to_numpy(v) for k, v in obj.items()}


def ssd_vgg_key_rules() -> Sequence[Tuple[str, Optional[str]]]:
    """Key rules for SSDVGG trunks named like ours (layer{s}_{j}/conv6../
    l2_norm) — the mirror convention ``tests/torch_refs.TorchSSDVGG`` and
    any converted SSD checkpoint following it."""
    return [
        (r"^(layer\d+_\d+)\.conv\.(.*)$", r"\1/conv.\2"),
        (r"^(conv\d+(?:_\d+)?)\.conv\.(.*)$", r"\1/conv.\2"),
        # 1-D "weight" leaves classify as a norm scale -> params/l2_norm/scale
        (r"^l2_norm\.scale$", r"l2_norm.weight"),
    ]
