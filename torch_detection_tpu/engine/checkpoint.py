"""Checkpoint save/load (orbax) + PyTorch import bridge.

Parity surface: reference ``models/utils/checkpoint.py`` (TCGGroup/
Torch_Detection): save = {meta(+time), weights, optimizer?} (``:138-169``),
tolerant load with missing/unexpected key reporting (``:11-64``), source
resolution by scheme (``:87-103``).

TPU-native: weights are flax pytrees saved via orbax (async-capable,
multi-host-safe); ``torch://<path>`` routes through the torch importer
(models/torch_import.py) with the same name mapping the reference relies on
(torchvision ``bn1/layer{i}`` naming, reference ``resnet.py:26-33``).
"""

from __future__ import annotations

import logging
import os
import time
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

logger = logging.getLogger(__name__)


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(
    path: str,
    variables: Dict[str, Any],
    opt_state: Any = None,
    meta: Optional[Dict] = None,
) -> None:
    """Save {'meta', 'variables', 'opt_state'} to ``path`` (a directory)."""
    path = os.path.abspath(os.path.expanduser(path))
    meta = dict(meta or {})
    meta.setdefault("time", time.asctime())
    payload = {"variables": jax.device_get(variables), "meta": meta}
    if opt_state is not None:
        payload["opt_state"] = jax.device_get(opt_state)
    _checkpointer().save(path, payload, force=True)


def latest_checkpoint(work_dir: str) -> Optional[str]:
    """Most recent ``epoch_N`` checkpoint dir in ``work_dir``, or None —
    elastic-restart affordance: a relaunched job resumes where it died."""
    work_dir = os.path.abspath(os.path.expanduser(work_dir))
    if not os.path.isdir(work_dir):
        return None
    best = None
    best_epoch = -1
    for name in os.listdir(work_dir):
        if name.startswith("epoch_"):
            try:
                e = int(name.split("_", 1)[1])
            except ValueError:
                continue
            if e > best_epoch and os.path.isdir(os.path.join(work_dir, name)):
                best_epoch = e
                best = os.path.join(work_dir, name)
    return best


def load_checkpoint_file(path: str) -> Dict[str, Any]:
    path = os.path.abspath(os.path.expanduser(path))
    return _checkpointer().restore(path)


def load_checkpoint(
    variables: Dict[str, Any],
    filename: str,
    strict: bool = False,
    log: Optional[logging.Logger] = None,
    key_rules=None,
) -> Tuple[Dict[str, Any], Dict]:
    """Load weights into an initialized variable tree.

    ``filename`` schemes:
      * ``torch://<path.pth>`` — import a PyTorch state_dict (torchvision
        naming) via the key-rule converter;
      * anything else — an orbax checkpoint directory saved by
        ``save_checkpoint``.

    Returns (new_variables, meta).  Missing/unexpected keys are logged, or
    raised when ``strict``.
    """
    log = log or logger
    if filename.startswith("torch://"):
        from ..models.torch_import import (
            RESNET_KEY_RULES,
            load_torch_checkpoint,
            load_torch_weights,
        )

        state_dict = load_torch_checkpoint(filename[len("torch://"):])
        new_vars = load_torch_weights(
            variables, state_dict,
            key_rules=key_rules if key_rules is not None else RESNET_KEY_RULES,
            strict=strict, log=log,
        )
        return new_vars, {"source": filename}

    payload = load_checkpoint_file(filename)
    loaded = payload["variables"]
    meta = payload.get("meta", {})

    flat_have = _flatten(variables)
    flat_new = _flatten(loaded)
    missing = sorted(set(flat_have) - set(flat_new))
    unexpected = sorted(set(flat_new) - set(flat_have))
    mismatched = [
        k
        for k in set(flat_have) & set(flat_new)
        if tuple(np.shape(flat_new[k])) != tuple(np.shape(flat_have[k]))
    ]
    problems = []
    if missing:
        problems.append(f"missing keys: {missing}")
    if unexpected:
        problems.append(f"unexpected keys: {unexpected}")
    if mismatched:
        problems.append(f"shape mismatches: {sorted(mismatched)}")
    if problems:
        msg = "; ".join(problems)
        if strict:
            raise RuntimeError(msg)
        log.warning("load_checkpoint: %s", msg)

    merged = dict(flat_have)
    for k, v in flat_new.items():
        if k in flat_have and k not in mismatched:
            merged[k] = v
    return _unflatten(merged), meta


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def _unflatten(flat):
    tree: Dict = {}
    for path, v in flat.items():
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = v
    return tree
