"""Haar wavelet + chi-square tests: algebraic invariants the oracle's
value hash can't express directly (energy conservation, reconstruction,
marginal consistency)."""

from collections import Counter

from tests.conftest import SF_DIR


def test_haar_energy_and_reconstruction(spark):
    """Unnormalized 2x2 Haar: ll^2+lh^2+hl^2+hh^2 == 4*(a^2+b^2+c^2+d^2)
    (Parseval), and the butterfly inverts exactly — a = (ll+lh+hl+hh)/4
    etc., all divisible by 4."""
    from mysql_to_clickhouse_sync_spark.operators.multimodal import (
        png_geometry,
        q_haar_wavelet,
    )

    rows = q_haar_wavelet(spark, SF_DIR).collect()
    assert rows
    seen = set()
    for r in rows:
        seen.add(r.media_id)
        w, h, seed = png_geometry(r.media_id)

        def pix(rr, cc):
            return (seed + 31 * (3 * (rr * w + cc) + 1)) % 256

        a = pix(2 * r.cell_row, 2 * r.cell_col)
        b = pix(2 * r.cell_row, 2 * r.cell_col + 1)
        c = pix(2 * r.cell_row + 1, 2 * r.cell_col)
        d = pix(2 * r.cell_row + 1, 2 * r.cell_col + 1)
        # Parseval (energy conservation through the transform)
        assert (
            r.ll**2 + r.lh**2 + r.hl**2 + r.hh**2
            == 4 * (a**2 + b**2 + c**2 + d**2)
        )
        # exact inversion
        assert (r.ll + r.lh + r.hl + r.hh) == 4 * a
        assert (r.ll - r.lh + r.hl - r.hh) == 4 * b
        assert (r.ll + r.lh - r.hl - r.hh) == 4 * c
        assert (r.ll - r.lh - r.hl + r.hh) == 4 * d
    assert len(seen) > 100  # the whole corpus flows through the codec


def test_chi2_marginal_consistency(spark, duck):
    """Cell counts must reproduce the corpus marginals; every term is
    non-negative; expected values sum (in milli) to ~1000*n."""
    from mysql_to_clickhouse_sync_spark.operators.stats import q_chi2_assoc

    rows = q_chi2_assoc(spark, SF_DIR).collect()
    assert rows
    n = duck.execute("SELECT count(*) FROM documents").fetchone()[0]
    assert sum(r.o for r in rows) == n
    lang_tot = Counter()
    src_tot = Counter()
    for r in rows:
        lang_tot[r.lang] += r.o
        src_tot[r.source] += r.o
        assert r.term_micro >= 0
        assert r.e_milli >= 0
    want_lang = dict(
        duck.execute(
            "SELECT lang, count(*) FROM documents GROUP BY lang"
        ).fetchall()
    )
    assert dict(lang_tot) == want_lang
    # expected totals: sum(r*c*1000//n) over the PRESENT cells (empty
    # contingency cells emit no row) — recompute from the marginals
    want_e = sum(
        lang_tot[r.lang] * src_tot[r.source] * 1000 // n for r in rows
    )
    assert sum(r.e_milli for r in rows) == want_e
    # term recomputation (float reference within 1 micro)
    for r in rows[:50]:
        rr = lang_tot[r.lang]
        cc = src_tot[r.source]
        d = n * r.o - rr * cc
        want = (d * d * 1_000_000) / (n * rr * cc)
        assert abs(r.term_micro - want) <= 1.0
