"""Tests for the driver-contract evaluation rotation
(__spark_entry__._rotation and friends).

The rotation decides which 50 queries receive external driver evidence
each round, and its failure mode is SILENT (a swallowed exception in
_changed_since_evidence falls back to age-only bands — round 8 found
exactly that: a Python 3.11 inline-regex-flag error had disabled change
tracking entirely). These tests pin the observable contract so a silent
regression fails CI instead of quietly skewing the window.
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entry  # noqa: E402
from datapipeline_scraping_spark.queries import REGISTRY  # noqa: E402


def test_rotation_is_a_permutation_of_the_registry():
    rot = entry._rotation()
    assert sorted(rot) == sorted(REGISTRY)
    assert len(set(rot)) == len(REGISTRY)


def test_change_detection_runs_and_is_well_typed():
    """_changed_since_evidence must not silently lose its machinery:
    it returns a dict mapping registry names to 'def'/'import'. (It
    may legitimately be empty on a clean tree where nothing changed
    since the newest evidence.)"""
    changed = entry._changed_since_evidence()
    assert isinstance(changed, dict)
    for name, kind in changed.items():
        assert name in REGISTRY
        assert kind in ("def", "import")


def test_import_matcher_patterns_compile_and_anchor():
    """The dotted-fragment patterns must compile on this Python (the
    r8 bug: a mid-pattern (?m) raised re.error inside a catch-all,
    disabling change tracking) and must match import statements but
    not prose mentions."""
    # replicate the two pattern shapes from imports_changed
    frag, head, leaf = "operators.dedup", "operators", "dedup"
    pat_sub = re.compile(
        f"(?m)^\\s*(?:from|import)\\s[^\\n]*"
        f"(?:{re.escape(frag)}"
        f"|{re.escape(head)} import [^\\n]*\\b{re.escape(leaf)}\\b)"
    )
    pat_root = re.compile(
        f"(?m)^\\s*from \\.{re.escape('curation')} import"
        f"|^\\s*from \\. import [^\\n]*\\b{re.escape('curation')}\\b"
    )
    assert pat_sub.search("from .operators.dedup import first_wins\n")
    assert pat_sub.search("    from .operators import dedup as D\n")
    assert pat_sub.search("import pkg.operators.dedup\n")
    assert not pat_sub.search(
        "    docstring mentioning operators.dedup prose\n"
    )
    assert pat_root.search("from .curation import run_funnel\n")
    assert not pat_root.search("see ..curation.run_funnel for details\n")


def test_rotation_band_order():
    """Never-evidenced queries outrank evidenced ones; inherently
    oracle-less (rows-only) queries sort behind every verifiable
    query; within the evidenced tail, older evidence comes first."""
    rot = entry._rotation()
    ev = entry._evidence_rounds()
    pos = {n: i for i, n in enumerate(rot)}

    oracleless = [n for n in rot if REGISTRY[n].oracle is None and n in ev]
    verifiable = [n for n in rot if REGISTRY[n].oracle is not None]
    if oracleless:
        worst_verifiable = max(pos[n] for n in verifiable)
        assert all(pos[n] > worst_verifiable - len(oracleless)
                   for n in oracleless)
        # strictly: every oracle-less evidenced row sits after every
        # verifiable row
        assert min(pos[n] for n in oracleless) > max(
            pos[n] for n in verifiable
        )

    never = [n for n in rot if n not in ev]
    if never and len(never) < len(rot):
        evidenced_verifiable = [n for n in verifiable if n in ev]
        # every never-evidenced query precedes every evidenced one,
        # except queries whose own source changed (band 2) may not
        # exist on a clean tree — band 2 sits between, so just check
        # against the age-banded tail
        changed = entry._changed_since_evidence()
        tail = [n for n in evidenced_verifiable
                if changed.get(n) != "def"]
        if tail:
            assert max(pos[n] for n in never) < min(pos[n] for n in tail)
