"""Property-based end-to-end checks for the round-12 additions: the
REGISTERED queries on randomized synthetic corpora (and the real
sf0.001 tables) vs naive brute-force recomputation — full-pairs
levenshtein + union-find for entity resolution, integer-exact ACF +
pure-Python Durbin-Levinson for PACF, per-document folds for the
two-way ANOVA. Same harness as test_round9/10/11_property.py."""

from __future__ import annotations

import math
import random
from collections import defaultdict

import pytest

from tests.test_round11_property import _write_events


def _run(spark, name, sf_dir):
    from be_analytic_etl_spark.registry import QUERIES

    return QUERIES[name](spark, sf_dir).collect()


# ---------------------------------------------------------------------------
# Entity resolution


def _lev(a: str, b: str) -> int:
    """Textbook unit-cost edit distance (the engines' levenshtein)."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


class _UF:
    def __init__(self):
        self.p = {}

    def find(self, x):
        self.p.setdefault(x, x)
        while self.p[x] != x:
            self.p[x] = self.p[self.p[x]]
            x = self.p[x]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.p[max(ra, rb)] = min(ra, rb)


def _er_bruteforce(vocab: dict[int, str], threshold: int, blocked: bool):
    """{id: entity_id} via exhaustive pairs (+ optional first/last-token
    blocking mirror) and union-find with min-id labels."""
    uf = _UF()
    ids = sorted(vocab)
    for x in ids:
        uf.find(x)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            na, nb = vocab[a], vocab[b]
            if blocked:
                if len(na) > 1000 or len(nb) > 1000:  # MAX_NAME_LEN guard
                    continue
                ta, tb = na.split(), nb.split()
                if not ta or not tb:
                    continue
                # key-SET semantics (ADVICE r12 #1): both the first and
                # the last token of every name enter ONE md5 block pool,
                # so a's first token colliding with b's LAST token is a
                # real candidate pair too — mirror the intersection, not
                # just the positionwise first-with-first/last-with-last
                if (
                    not ({ta[0], ta[-1]} & {tb[0], tb[-1]})
                    or abs(len(na) - len(nb)) > threshold
                ):
                    continue
            if _lev(na, nb) <= threshold:
                uf.union(a, b)
    # min-id label per component
    comp = defaultdict(list)
    for x in ids:
        comp[uf.find(x)].append(x)
    return {x: min(members) for members in comp.values() for x in members}


def _er_readout(labels: dict[int, str], vocab: dict[int, str]):
    """(entity_id, n_names, canonical_name) rows from a labeling."""
    rows = defaultdict(list)
    for x, e in labels.items():
        rows[e].append(x)
    return {
        (e, len(ms), vocab[e]) for e, ms in rows.items()
    }


def test_entity_resolution_matches_bruteforce_on_real_vocab(spark):
    """On the real part vocabulary blocking is full-recall (verified:
    every lev<=3 pair shares its first or last token), so the blocked
    pipeline must equal the UNBLOCKED exhaustive ER exactly."""
    import duckdb

    vocab = {
        int(i): n
        for n, i in duckdb.sql(
            "SELECT p_name, MIN(p_partkey) FROM "
            "read_parquet('/root/testdata/sf0.001/part.parquet') GROUP BY 1"
        ).fetchall()
    }
    want = _er_readout(_er_bruteforce(vocab, 3, blocked=False), vocab)
    got = {
        (r.entity_id, r.n_names, r.canonical_name)
        for r in _run(spark, "ext_entity_resolution", "/root/testdata/sf0.001")
    }
    assert got == want and len(want) > 0


@pytest.mark.parametrize("seed", [70, 71, 72])
def test_entity_resolution_matches_blocked_bruteforce(spark, tmp_path, seed):
    """Randomized vocabularies (typo'd two-word names, one-word names,
    blanks, shared tokens) vs a Python mirror of the SAME
    blocking+verify+closure semantics — checks the distributed join /
    flood-guard / CC machinery, independent of blocking recall."""
    rng = random.Random(seed)
    firsts = ["red", "rod", "blue", "blu", "cold", "old", "hot", "hott"]
    lasts = ["bolt", "bolz", "gear", "gears", "ring", "rng", "anvil"]
    names = set()
    for _ in range(rng.randint(10, 40)):
        kind = rng.random()
        if kind < 0.7:
            names.add(f"{rng.choice(firsts)} {rng.choice(lasts)}")
        elif kind < 0.85:
            names.add(rng.choice(firsts + lasts))
        else:
            names.add(
                f"{rng.choice(firsts)} {rng.choice(lasts)} "
                f"{rng.choice(lasts)}"
            )
    rows = [(i * 7 + 3, n) for i, n in enumerate(sorted(names))]
    df = spark.createDataFrame(
        [
            (pk, n, "Brand#1", "ECONOMY", 1, 1.0)
            for pk, n in rows
        ],
        "p_partkey long, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double",
    )
    sf_dir = str(tmp_path / f"sf_er{seed}")
    df.coalesce(1).write.mode("overwrite").parquet(f"{sf_dir}/part.parquet")

    vocab = {pk: n for pk, n in rows}
    want = _er_readout(_er_bruteforce(vocab, 3, blocked=True), vocab)
    got = {
        (r.entity_id, r.n_names, r.canonical_name)
        for r in _run(spark, "ext_entity_resolution", sf_dir)
    }
    assert got == want and len(want) > 0


# ---------------------------------------------------------------------------
# PACF


def _pacf_bruteforce(daily_cents: list[int], max_lag: int):
    """{lag: (acf, pacf)} with the engines' exact arithmetic: integer
    d_t = n*c_t - total, integer num/den, ONE float division per rho,
    then float Durbin-Levinson with left-to-right accumulation (the
    generated expressions' evaluation order)."""
    n = len(daily_cents)
    tot = sum(daily_cents)
    d = [n * c - tot for c in daily_cents]
    den = sum(x * x for x in d)
    rho: dict[int, float | None] = {}
    for l in range(1, max_lag + 1):
        if l >= n or den <= 0:
            rho[l] = None
            continue
        num = sum(d[t] * d[t + l] for t in range(n - l))
        rho[l] = num / den
    phi_prev: dict[int, float | None] = {1: rho[1]}
    pacf = {1: rho[1]}
    for k in range(2, max_lag + 1):
        num = den_k = None
        if rho[k] is not None and all(
            phi_prev.get(j) is not None and rho[j] is not None
            for j in range(1, k)
        ):
            s_num = 0.0
            s_den = 0.0
            for j in range(1, k):
                s_num += phi_prev[j] * rho[k - j]
                s_den += phi_prev[j] * rho[j]
            num = rho[k] - s_num
            den_k = 1.0 - s_den
        phi_kk = None if num is None else num / den_k
        pacf[k] = phi_kk
        nxt = {k: phi_kk}
        for j in range(1, k):
            if phi_kk is None or phi_prev[j] is None:
                nxt[j] = None
            else:
                nxt[j] = phi_prev[j] - phi_kk * phi_prev[k - j]
        phi_prev = nxt
    return {l: (rho[l], pacf[l]) for l in range(1, max_lag + 1)}


def _round6(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return None
    return round(v, 6)


@pytest.mark.parametrize("seed", [80, 81, 82])
def test_pacf_matches_python_durbin_levinson(spark, tmp_path, seed):
    rng = random.Random(seed)
    n_days = rng.choice([1, 3, 9, 30])
    rows = []
    for day in range(n_days):
        for _ in range(rng.randint(1, 4)):
            rows.append(
                (
                    rng.randint(0, 5),
                    f"2024-01-{day + 1:02d} 10:00:00",
                    "click",
                    round(rng.uniform(-5, 50), 2),
                )
            )
    sf_dir = str(tmp_path / f"sf_pacf{seed}")
    _write_events(spark, sf_dir, rows)

    daily = defaultdict(int)
    for _, ts, _, v in rows:
        daily[ts[:10]] += round(v * 100)
    series = [daily[k] for k in sorted(daily)]
    want = {
        l: (_round6(a), _round6(p))
        for l, (a, p) in _pacf_bruteforce(series, 7).items()
    }
    got = {
        r.lag: (r.acf, r.pacf) for r in _run(spark, "ext_pacf", sf_dir)
    }
    assert set(got) == set(want)
    for l in want:
        for gv, wv in zip(got[l], want[l]):
            if wv is None:
                assert gv is None, (l, got[l], want[l])
            else:
                assert gv == pytest.approx(wv, abs=1e-9), (l, got[l], want[l])


def _pacf_both_engines(spark, sf_dir):
    import duckdb

    from be_analytic_etl_spark.registry import ORACLE_SQL

    got = {r.lag: (r.acf, r.pacf) for r in _run(spark, "ext_pacf", sf_dir)}
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet/*.parquet')"
    )
    oracle = {
        l: (a, p)
        for l, a, p in con.execute(ORACLE_SQL["ext_pacf"]).fetchall()
    }
    return got, oracle


def test_pacf_empty_corpus_parity(spark, tmp_path):
    """ext_ljung_box's ADVICE lesson applied up front: on an EMPTY
    events table both the Spark query and the DuckDB oracle must emit
    the same shape — 7 lag rows, all-NULL acf/pacf."""
    sf_dir = str(tmp_path / "sf_pacf_empty")
    _write_events(spark, sf_dir, [])
    got, oracle = _pacf_both_engines(spark, sf_dir)
    assert len(got) == len(oracle) == 7
    assert all(v == (None, None) for v in got.values())
    assert all(v == (None, None) for v in oracle.values())


def test_pacf_constant_series_parity(spark, tmp_path):
    """A constant daily series (den = 0 — the other ljung-box degenerate
    shape) must yield 7 all-NULL rows in BOTH engines."""
    rows = [
        (1, f"2024-01-{d:02d} 10:00:00", "click", 5.0) for d in range(1, 11)
    ]
    sf_dir = str(tmp_path / "sf_pacf_const")
    _write_events(spark, sf_dir, rows)
    got, oracle = _pacf_both_engines(spark, sf_dir)
    assert got == oracle and len(got) == 7
    assert all(v == (None, None) for v in got.values())


# ---------------------------------------------------------------------------
# Two-way ANOVA


def test_anova_two_way_matches_python_fold(spark):
    """Brute-force the factorial decomposition from the PER-DOCUMENT
    6dp scores (taken from the engine's own quality_score, which is
    property-tested elsewhere) using exact Fraction moments, on the
    real sf0.001 corpus."""
    from fractions import Fraction

    from pyspark.sql import functions as F

    from be_analytic_etl_spark.functions.rounding import stable_round
    from be_analytic_etl_spark.operators import textstats as T
    from be_analytic_etl_spark.sources import load_table

    sf_dir = "/root/testdata/sf0.001"
    docs = load_table(spark, sf_dir, "documents").select(
        "lang",
        "source",
        stable_round(T.quality_score("text", round_to=None), 6).alias("q6"),
    )
    per_doc = [
        (r.lang, r.source, Fraction(str(r.q6))) for r in docs.collect()
    ]

    def term(s1: Fraction, n: int) -> Fraction:
        # stable_round(x, 6) = round-half-up at 6dp, like the engines
        x = float(s1) * float(s1) / n
        return Fraction(
            math.floor(abs(x) * 10**6 + 0.5) * (1 if x >= 0 else -1), 10**6
        )

    cells: dict[tuple, list] = defaultdict(lambda: [0, Fraction(0), Fraction(0)])
    for lang, source, q in per_doc:
        c = cells[(lang, source)]
        c[0] += 1
        c[1] += q
        c[2] += q * q
    n = sum(c[0] for c in cells.values())
    k_cells = len(cells)
    la: dict[str, list] = defaultdict(lambda: [0, Fraction(0)])
    lb: dict[str, list] = defaultdict(lambda: [0, Fraction(0)])
    for (lang, source), (nc, s1, _) in cells.items():
        la[lang][0] += nc
        la[lang][1] += s1
        lb[source][0] += nc
        lb[source][1] += s1
    ta = sum((term(s1, na) for na, s1 in la.values()), Fraction(0))
    tb = sum((term(s1, nb) for nb, s1 in lb.values()), Fraction(0))
    tc = sum((term(s1, nc) for nc, s1, _ in cells.values()), Fraction(0))
    s1g = sum((c[1] for c in cells.values()), Fraction(0))
    s2g = sum((c[2] for c in cells.values()), Fraction(0))
    grand = float(s1g) * float(s1g) / n
    ss_lang = float(ta) - grand
    ss_source = float(tb) - grand
    ss_cells = float(tc) - grand
    ss_within = float(s2g) - float(tc)
    ss_inter = ss_cells - ss_lang - ss_source
    k_lang, k_source = len(la), len(lb)

    (row,) = _run(spark, "ext_anova_two_way", sf_dir)
    assert (row.n, row.k_lang, row.k_source, row.k_cells) == (
        n, k_lang, k_source, k_cells,
    )
    assert float(row.ss_lang) == pytest.approx(ss_lang, abs=1e-6)
    assert float(row.ss_source) == pytest.approx(ss_source, abs=1e-6)
    assert float(row.ss_inter) == pytest.approx(ss_inter, abs=1e-6)
    assert float(row.ss_within) == pytest.approx(ss_within, abs=1e-6)
    # the readout quantizes F stats at 6dp
    f_lang = (ss_lang / (k_lang - 1)) / (ss_within / (n - k_cells))
    assert float(row.f_lang) == pytest.approx(f_lang, abs=1e-6)
    f_inter = (
        ss_inter / (k_cells - k_lang - k_source + 1)
    ) / (ss_within / (n - k_cells))
    assert float(row.f_inter) == pytest.approx(f_inter, abs=1e-6)


@pytest.mark.parametrize("seed", [90, 91])
def test_anova_two_way_balanced_identity(spark, tmp_path, seed):
    """On a BALANCED synthetic design the sequential identity is the
    textbook decomposition: ss_lang + ss_source + ss_inter + ss_within
    must equal the total SS, and ss_inter must be >= -1e-9 (the
    negative-interaction caveat only applies to unbalanced cells)."""
    rng = random.Random(seed)
    langs = ["en", "fr", "de"][: rng.randint(2, 3)]
    sources = ["web", "book"]
    rows = []
    i = 0
    words = ["the", "data", "pipeline", "runs", "well", "at", "scale"]
    for lang in langs:
        for source in sources:
            for _ in range(5):
                text = " ".join(
                    rng.choice(words) for _ in range(rng.randint(3, 30))
                )
                rows.append((i, text, lang, source, len(text)))
                i += 1
    df = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf_dir = str(tmp_path / f"sf_an2{seed}")
    df.coalesce(1).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")

    (row,) = _run(spark, "ext_anova_two_way", sf_dir)
    assert row.k_cells == len(langs) * len(sources)
    assert float(row.ss_inter) >= -1e-9
    # total SS from per-doc values (engine's own scores, exact fold)
    from pyspark.sql import functions as F

    from be_analytic_etl_spark.functions.rounding import stable_round
    from be_analytic_etl_spark.operators import textstats as T
    from be_analytic_etl_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        stable_round(T.quality_score("text", round_to=None), 6).alias("q6")
    )
    vals = [float(r.q6) for r in docs.collect()]
    mean = sum(vals) / len(vals)
    ss_total = sum((v - mean) ** 2 for v in vals)
    got_total = (
        float(row.ss_lang)
        + float(row.ss_source)
        + float(row.ss_inter)
        + float(row.ss_within)
    )
    assert got_total == pytest.approx(ss_total, abs=1e-4)
