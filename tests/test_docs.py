"""Docs consistency guard (VERDICT r4 weak #2): user-facing numbers must
track the source of truth so README/MIGRATING can't silently rot.

- family count in README and docs/MIGRATING.md == the number of detector
  Config classes exported by ``models.detectors`` (the framework's "family"
  unit: one ``*Config`` per family, counting SSD300/512 as one);
- README's headline images/s == the latest committed ``BENCH_r*.json``.
"""

import glob
import json
import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _family_count() -> int:
    import torch_detection_tpu.models.detectors as det

    return len([n for n in dir(det) if n.endswith("Config")])


@pytest.mark.core
def test_readme_family_count_matches_registry():
    text = open(os.path.join(REPO, "README.md")).read()
    m = re.search(r"(\d+) detector\s+families", text)
    assert m, "README must state '<N> detector families' as a digit"
    assert int(m.group(1)) == _family_count(), (
        f"README says {m.group(1)} families; models.detectors exports "
        f"{_family_count()} *Config classes — update README.md"
    )


@pytest.mark.core
def test_migrating_family_count_matches_registry():
    text = open(os.path.join(REPO, "docs", "MIGRATING.md")).read()
    m = re.search(r"(\d+) families:", text)
    assert m, "MIGRATING.md must state '<N> families:' as a digit"
    assert int(m.group(1)) == _family_count(), (
        f"MIGRATING.md says {m.group(1)} families; models.detectors exports "
        f"{_family_count()} — update docs/MIGRATING.md"
    )


@pytest.mark.core
def test_readme_headline_matches_latest_bench():
    def _round_no(p):
        m = re.search(r"BENCH_r(\d+)\.json$", p)
        return int(m.group(1)) if m else -1

    benches = sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json")), key=_round_no)
    if not benches:
        pytest.skip("no committed BENCH_r*.json")
    parsed = json.load(open(benches[-1])).get("parsed")
    if not parsed:
        pytest.skip("latest BENCH file has no parsed result")
    text = open(os.path.join(REPO, "README.md")).read()
    m = re.search(r"Headline \(bench\.py\).*?\*\*([\d.]+) images/s\*\*",
                  text, re.DOTALL)
    assert m, "README must carry a bolded headline images/s"
    assert float(m.group(1)) == pytest.approx(parsed["value"], abs=0.05), (
        f"README headline {m.group(1)} != latest bench {parsed['value']} "
        f"({os.path.basename(benches[-1])}) — refresh README.md"
    )
