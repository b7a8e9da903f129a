"""Registry invariants the driver's grading depends on: the first 50 entries
of ``all_queries()`` (the driver's CORRECTNESS window) must all be
strong-oracle, and oracle-less queries must never burn graded slots."""

from __future__ import annotations

from dask_image_spark import queries as q
from dask_image_spark.queries.base import REGISTRY, WINDOW

q.load_all()


def test_window_is_exactly_fifty_strong_names():
    assert len(WINDOW) == 50, len(WINDOW)
    assert len(set(WINDOW)) == 50
    missing = [n for n in WINDOW if n not in REGISTRY]
    assert not missing, f"WINDOW names not registered: {missing}"
    unoracled = [n for n in WINDOW if REGISTRY[n].oracle is None]
    assert not unoracled, f"WINDOW names without oracle: {unoracled}"


def test_first_fifty_graded_queries_all_have_oracles():
    names = list(q.all_queries())
    oracles = q.all_oracles()
    weak_in_window = [n for n in names[:50] if n not in oracles]
    assert not weak_in_window, weak_in_window


def test_oracleless_queries_sort_last():
    names = list(q.all_queries())
    oracles = q.all_oracles()
    seen_weak = False
    for n in names:
        if n not in oracles:
            seen_weak = True
        else:
            assert not seen_weak, f"strong-oracle {n} after an oracle-less query"


def test_coverage_doc_header_count_matches_registry():
    """COVERAGE.md's headline query count went stale in round 6 (said 207
    while the registry held 220) — pin it to the registry so the audit
    doc can never silently drift again."""
    import re
    from pathlib import Path

    text = Path(__file__).resolve().parent.parent.joinpath("COVERAGE.md").read_text()
    m = re.search(r"EVERY registered query \((\d+)\)", text)
    assert m, "COVERAGE.md header count sentence missing"
    assert int(m.group(1)) == len(REGISTRY), (
        f"COVERAGE.md says {m.group(1)} queries, registry has {len(REGISTRY)}"
    )
