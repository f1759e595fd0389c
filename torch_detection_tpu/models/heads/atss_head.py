"""ATSS head: anchor-based towers + per-level scales + centerness branch.

Seventh detector family (ATSS, Zhang et al., CVPR 2020 — "Bridging the Gap
Between Anchor-based and Anchor-free Detection").  The reference never built
a detector tier (TCGGroup/Torch_Detection ``models/__init__.py`` is empty;
SURVEY.md §2 #33 [ABSENT]); ATSS extends this framework's coverage beyond
the reference's aspirations.

The module layout is identical to FCOSHead — shared 4-conv GN towers, a
classification conv, a regression conv scaled by a learnable per-level
scalar, and a centerness conv on the regression tower — but the regression
output is interpreted as anchor *deltas* (one anchor per location,
``octave_base_scale=8``) rather than exp-mapped ltrb distances, and targets
come from the adaptive ATSS assigner (``ops/assign.py``).
"""

from __future__ import annotations

from ...utils.registry import HEADS
from .fcos_head import FCOSHead


@HEADS.register_module
class ATSSHead(FCOSHead):
    """Same parameter tree as FCOSHead; semantics differ only downstream
    (delta decode in ``models/detectors/atss.py``)."""


@HEADS.register_module
class PAAHead(ATSSHead):
    """PAA (Kim & Lee, ECCV 2020) shares ATSS's module tree; the third
    branch is read as an IoU prediction and assignment happens in
    ``models/detectors/paa.py`` (GMM-split candidate scoring)."""
