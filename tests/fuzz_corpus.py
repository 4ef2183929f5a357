"""Adversarial corpus generator for registry-level differential fuzzing.

Generates all ten fixture tables with the hazards the clean driver data
never exercises — the input classes that real 100 TB corpora are full
of and that every cross-engine divergence found so far hid behind:

- documents: exact-duplicate and one-token-mutated texts (dense tie
  structure on a tiny vocabulary), single-token and one-token-repeated
  docs, EMPTY docs, NULL docs, whitespace-only and padded docs,
  NULL lang (unlabeled crawl), non-ASCII tokens (accents, Hebrew,
  emoji — multi-byte UTF-8), double-space/tab whitespace;
- events: same-user same-timestamp ties, inactivity gaps exactly AT
  and 1 s over the session boundary, sub-second offsets, NULL values,
  NULL ts / user_id / event_type (every identity column of a real
  feed goes missing sometimes; NULL ts hits Spark's window()-drops-
  NULL-buckets vs date-arithmetic NULL buckets, and ORDER BY NULLS
  FIRST (Spark) vs LAST (DuckDB) — gated at the scan on both sides),
  round-half values (x.5, x.123455), NULL / malformed / missing-key /
  non-numeric-value JSON props;
- embeddings: exact-duplicate vectors (cosine = 1 ties), near
  duplicates, negated vectors (cosine = -1), tiny-norm vectors,
  NULL / empty / unlabeled vectors (failed model outputs — DuckDB's
  list_inner_product hard-errors on them while Spark NULL-propagates;
  gated at the scan with the NaN/Inf hazards);
- TPC-H-ish tables: price ties (many rows at exactly 100.0), zero
  prices, round-half prices (x.005), NULL acctbal, dangling foreign
  keys (custkeys/nationkeys with no parent), NULL FK columns
  (o_custkey / l_partkey / l_suppkey / c_nationkey — joins and
  groupings handle these consistently across engines; planted as
  regression armor), orders with zero lineitems, shipdates before
  the order date, order timestamps at date boundaries (midnight,
  23:59:59).

Everything is deterministic in the seed (plain random.Random): a
failing seed reproduces exactly, no shrinking needed. Used by
tests/test_registry_fuzz.py (quick gate) and scripts/fuzz_sweep.py
(full-registry campaign).
"""

from __future__ import annotations

import random

import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = ["key", "agg", "row", "scan", "slow", "fast", "table", "value",
         "part", "hash", "the", "a", "emigre", "x1", "sort", "window"]
# İstanbul and the trailing-Σ Greek words are load-bearing: Java/Spark
# full-case lower() maps İ -> i+U+0307 and word-final Σ -> ς where
# DuckDB's simple case map does not (emulated in the oracle's
# clean_token_sql via functions/text.py::_java_lower_duckdb)
UVOCAB = VOCAB + ["café", "שלום", "\U0001f600", "á",
                  "İstanbul", "ΘΕΟΣ", "ΑΣ", "Straße"]
LANGS = ["en", "de"]
SOURCES = ["cc", "wiki", "books"]
# 'purchase' and 'click' are load-bearing: q_attribution filters on
# them and rel_range_join's follow side is 'purchase' — without them in
# the vocabulary those queries are vacuously green on every seed.
ETYPES = ["click", "view", "error", "buy", "purchase"]
EMB_DIM = 64

SEGS = ["AUTO", "BLDG", "MACH"]
STATUS = ["O", "F", "P"]
PRIO = ["1-URGENT", "3-MEDIUM", "5-LOW"]
RFLAG = ["A", "N", "R"]
LSTAT = ["O", "F"]
BRANDS = ["B#1", "B#2"]
TYPES = ["small brass", "large steel"]


def gen_documents(rng: random.Random, n: int = 120) -> pa.Table:
    bases = [" ".join(rng.choices(UVOCAB, k=rng.randint(3, 30)))
             for _ in range(6)]
    rows = []
    ids = rng.sample(range(0, 100000), n)
    for i in range(n):
        mode = rng.randrange(12)
        if mode < 3:                     # exact duplicate of a base
            text = rng.choice(bases)
        elif mode < 6:                   # near-duplicate: mutate one token
            toks = rng.choice(bases).split(" ")
            toks[rng.randrange(len(toks))] = rng.choice(UVOCAB)
            text = " ".join(toks)
        elif mode == 6:                  # single token
            text = rng.choice(UVOCAB)
        elif mode == 7:                  # one token repeated
            text = " ".join([rng.choice(UVOCAB)] * rng.randint(2, 12))
        elif mode == 8:                  # empty text
            text = ""
        elif mode == 9:                  # NULL text (failed fetch)
            text = None
        elif mode == 10:                 # whitespace corners
            text = rng.choice(["a  b\tc " + rng.choice(UVOCAB),
                               "   ",                      # whitespace-only
                               "  " + rng.choice(UVOCAB) + " "])  # padded
        else:
            text = " ".join(rng.choices(UVOCAB, k=rng.randint(1, 12)))
        nc = len(text) if text is not None else None
        lang = None if rng.randrange(17) == 0 else rng.choice(LANGS)
        rows.append((ids[i], text, lang, rng.choice(SOURCES), nc))
    cols = list(zip(*rows))
    return pa.table({"doc_id": pa.array(cols[0], pa.int64()),
                     "text": pa.array(cols[1], pa.string()),
                     "lang": pa.array(cols[2], pa.string()),
                     "source": pa.array(cols[3], pa.string()),
                     "n_chars": pa.array(cols[4], pa.int64())})


def gen_events(rng: random.Random, n: int = 200) -> pa.Table:
    base = 1704067200_000000  # 2024-01-01 UTC, microseconds
    rows = []
    users = [0, 1, 2, 7]
    cur = {u: base + rng.randint(0, 3600) * 1000000 for u in users}
    for i in range(n):
        u = rng.choice(users)
        mode = rng.randrange(10)
        if mode < 3:
            step = rng.randint(1, 600)   # in-session
        elif mode == 3:
            step = 1800                  # exactly AT the session gap
        elif mode == 4:
            step = 1801                  # just over it
        elif mode == 5:
            step = 0                     # tie: same user, same ts
        else:
            step = rng.randint(601, 7200)
        cur[u] += step * 1000000
        if rng.randrange(8) == 0:
            cur[u] += rng.randint(1, 999999)  # sub-second offset
        vmode = rng.randrange(10)
        if vmode == 0:
            value = 0.0
        elif vmode == 1:
            value = -rng.randint(1, 50) + 0.5
        elif vmode == 2:
            value = rng.randint(0, 100) + 0.123455  # round-6 boundary
        elif vmode in (3, 6, 7):
            value = None                 # missing measurement
        else:
            value = round(rng.uniform(-20, 120), 2)
        # the magnitude rows are load-bearing: a syntactically valid
        # JSON number can exceed double (1e999 -> Inf) or long range
        # (1e300, 22 nines) — Spark's floor(DOUBLE) silently saturates
        # at ±LONG_MAX where DuckDB's bigint cast hard-errors, so the
        # extraction guards magnitude (q_json_extract)
        props = rng.choice(['{"k": %d}' % rng.randint(0, 99), '{}',
                            '{"j": 4}', None, 'not json', '{"k": "x"}',
                            '{"k": 1.5}', '{"k": true}',
                            '{"k": 1e999}', '{"k": 1e300}',
                            '{"k": -1e999}',
                            '{"k": 9999999999999999999999}'])
        # identity-column dropout: NULL ts / user_id / event_type
        # (the clock still advances per user so the stream stays real)
        ts = None if rng.randrange(23) == 0 else cur[u]
        uid = None if rng.randrange(31) == 0 else u
        etype = None if rng.randrange(29) == 0 else rng.choice(ETYPES)
        rows.append((i, ts, uid, etype, value, props))
    cols = list(zip(*rows))
    return pa.table({"event_id": pa.array(cols[0], pa.int64()),
                     "ts": pa.array(cols[1], pa.timestamp("us")),
                     "user_id": pa.array(cols[2], pa.int64()),
                     "event_type": pa.array(cols[3], pa.string()),
                     "value": pa.array(cols[4], pa.float64()),
                     "props": pa.array(cols[5], pa.string())})


def gen_embeddings(rng: random.Random, n: int = 80,
                   dim: int = EMB_DIM) -> pa.Table:
    bases = [[rng.uniform(-1, 1) for _ in range(dim)] for _ in range(5)]
    rows = []
    for i in range(n):
        mode = rng.randrange(10)
        if mode < 3:                     # exact duplicate (cosine = 1)
            v = list(rng.choice(bases))
        elif mode < 6:                   # near duplicate
            v = [x + rng.uniform(-0.01, 0.01) for x in rng.choice(bases)]
        elif mode == 6:                  # negated (cosine = -1)
            v = [-x for x in rng.choice(bases)]
        elif mode == 7:                  # tiny norm
            v = [x * 1e-6 for x in rng.choice(bases)]
        else:
            v = [rng.uniform(-1, 1) for _ in range(dim)]
        rows.append((i, [float(round(x, 6)) for x in v], rng.randrange(4)))
    cols = list(zip(*rows))
    return pa.table({"vec_id": pa.array(cols[0], pa.int64()),
                     "embedding": pa.array(cols[1], pa.list_(pa.float32())),
                     "label": pa.array(cols[2], pa.int32())})


def _price(rng: random.Random) -> float:
    m = rng.randrange(8)
    if m == 0:
        return 0.0
    if m == 1:
        return round(rng.uniform(1, 50), 2) + 0.005   # round-half boundary
    if m == 2:
        return 100.0                                   # heavy ties
    return round(rng.uniform(1, 5000), 2)


def gen_tpch(rng: random.Random, out: str) -> None:
    region = [(i, f"R{i}") for i in range(3)]
    nation = [(i, f"N{i}", rng.randrange(3)) for i in range(5)]
    ncust, nsupp, npart, nord = 40, 10, 25, 120
    # nationkey 5 = dangling FK; None = NULL FK (both consistent
    # across engines — planted as regression armor)
    cust = [(i, f"C{i}",
             None if rng.randrange(13) == 0 else rng.randrange(6),
             _price(rng) if rng.randrange(10) else None,
             rng.choice(SEGS)) for i in range(ncust)]
    supp = [(i, f"S{i}", rng.randrange(5), _price(rng))
            for i in range(nsupp)]
    part = [(i, f"P{i}", rng.choice(BRANDS), rng.choice(TYPES),
             rng.choice([1, 5, 5, 50]), _price(rng)) for i in range(npart)]
    base_day = 1704067200  # 2024-01-01, seconds
    orders, lineitem = [], []
    for o in range(nord):
        ck = (None if rng.randrange(19) == 0
              else rng.randrange(ncust + 3))   # dangling + NULL custkeys
        od = (base_day + rng.randrange(0, 120) * 86400
              + rng.choice([0, 0, 0, 3600, 86399]))  # date boundaries
        orders.append((o, ck, rng.choice(STATUS), _price(rng),
                       od * 1000000, rng.choice(PRIO)))
        for ln in range(rng.randrange(0, 5)):  # 0-line orders exist
            sd = od + rng.choice([-86400, 0, 86400 * rng.randrange(1, 60)])
            lineitem.append((o,
                             None if rng.randrange(23) == 0
                             else rng.randrange(npart),
                             None if rng.randrange(29) == 0
                             else rng.randrange(nsupp),
                             ln + 1, float(rng.choice([0, 1, 1, 25, 50])),
                             _price(rng),
                             rng.choice([0.0, 0.05, 0.1]),
                             rng.choice([0.0, 0.08]),
                             rng.choice(RFLAG), rng.choice(LSTAT),
                             sd * 1000000))

    def tab(rows, spec):
        cols = list(zip(*rows)) if rows else [[] for _ in spec]
        return pa.table({n: pa.array(c, t)
                         for (n, t), c in zip(spec, cols)})

    pq.write_table(tab(region, [("r_regionkey", pa.int32()),
                                ("r_name", pa.string())]),
                   f"{out}/region.parquet")
    pq.write_table(tab(nation, [("n_nationkey", pa.int32()),
                                ("n_name", pa.string()),
                                ("n_regionkey", pa.int32())]),
                   f"{out}/nation.parquet")
    pq.write_table(tab(cust, [("c_custkey", pa.int64()),
                              ("c_name", pa.string()),
                              ("c_nationkey", pa.int32()),
                              ("c_acctbal", pa.float64()),
                              ("c_mktsegment", pa.string())]),
                   f"{out}/customer.parquet")
    pq.write_table(tab(supp, [("s_suppkey", pa.int64()),
                              ("s_name", pa.string()),
                              ("s_nationkey", pa.int32()),
                              ("s_acctbal", pa.float64())]),
                   f"{out}/supplier.parquet")
    pq.write_table(tab(part, [("p_partkey", pa.int64()),
                              ("p_name", pa.string()),
                              ("p_brand", pa.string()),
                              ("p_type", pa.string()),
                              ("p_size", pa.int32()),
                              ("p_retailprice", pa.float64())]),
                   f"{out}/part.parquet")
    pq.write_table(tab(orders, [("o_orderkey", pa.int64()),
                                ("o_custkey", pa.int64()),
                                ("o_orderstatus", pa.string()),
                                ("o_totalprice", pa.float64()),
                                ("o_orderdate", pa.timestamp("us")),
                                ("o_orderpriority", pa.string())]),
                   f"{out}/orders.parquet")
    pq.write_table(tab(lineitem, [("l_orderkey", pa.int64()),
                                  ("l_partkey", pa.int64()),
                                  ("l_suppkey", pa.int64()),
                                  ("l_linenumber", pa.int32()),
                                  ("l_quantity", pa.float64()),
                                  ("l_extendedprice", pa.float64()),
                                  ("l_discount", pa.float64()),
                                  ("l_tax", pa.float64()),
                                  ("l_returnflag", pa.string()),
                                  ("l_linestatus", pa.string()),
                                  ("l_shipdate", pa.timestamp("us"))]),
                   f"{out}/lineitem.parquet")


ALL_TABLES = ("documents", "events", "embeddings", "region", "nation",
              "customer", "supplier", "part", "orders", "lineitem")


def _apply_embedding_extremes(emb: pa.Table) -> pa.Table:
    """Corrupt-vector hazards: an all-NaN vector, an Inf component, a
    NULL vector, an EMPTY vector, and an unlabeled row (failed model
    outputs). The NaN/Inf pair poisoned every quantizing/moment
    operator divergently until the finite-vector gate; NULL/empty
    hard-error DuckDB's list_inner_product while Spark NULL-propagates
    — all gated at the scan, kept here so the gate stays honest."""
    d = emb.to_pydict()
    d["embedding"][0] = [float("nan")] * EMB_DIM
    d["embedding"][1] = [float("inf")] + [0.1] * (EMB_DIM - 1)
    d["embedding"][12] = None
    d["embedding"][13] = []
    d["label"][14] = None
    # all-zero vector: norm 0 -> cosine 0/0, an ANSI DIVIDE_BY_ZERO
    # stop-the-query error in Spark vs NULL in DuckDB (8 queries when
    # first planted) — gated at the scan with the other failed-output
    # shapes. The denormal-norm vector is armor: its norm accumulates
    # fine in DOUBLE, so it must NOT be gated.
    d["embedding"][15] = [0.0] * EMB_DIM
    d["embedding"][16] = [5e-39] * EMB_DIM
    # NULL COMPONENT inside an otherwise-valid vector: Spark's
    # three-valued `NOT exists(..)` gate evaluates NULL on it and
    # drops the row, but DuckDB's list_filter drops NULL lambda
    # results, so the old oracle gate KEPT the row and then
    # hard-errored in list_dot_product — the gate now mirrors with an
    # explicit x IS NULL test.
    d["embedding"][17] = [0.5] * (EMB_DIM - 1) + [None]
    return pa.table({k: pa.array(v, emb.schema.field(k).type)
                     for k, v in d.items()})


def _apply_extremes(docs: pa.Table, events: pa.Table,
                    rng: random.Random) -> tuple[pa.Table, pa.Table]:
    """Hazard tier 2: magnitude/domain extremes planted on top of the
    generated tables — negative ids, whitespace-only text, an unknown
    language, a very long document, PRE-EPOCH event times (1969; these
    exposed the streaming initial-watermark drop), large values, and
    non-finite / signed-zero measurements (NaN, ±Inf, -0.0 — these
    exposed the value-quantization cast divergence, 25 queries).
    """
    d = docs.to_pydict()
    d["doc_id"][0] = -5
    d["text"][1], d["n_chars"][1] = "   ", 3
    d["lang"][2] = "xx"
    d["text"][3] = " ".join(rng.choices(UVOCAB, k=5000))
    d["n_chars"][3] = len(d["text"][3])
    # Control / invisible / combining codepoints (crawl text is full of
    # them): newlines + CRLF + tab + NUL inside tokens — the literal
    # single-space split must carry them through identically on both
    # engines — plus zero-width space and a combining acute (length()
    # must count codepoints, not graphemes, on both sides).
    d["text"][4] = "line1\nline2\r\nline3\tword a\x00nul"
    d["n_chars"][4] = len(d["text"][4])
    d["text"][5] = "a\u200bb e\u0301 zero\u200bwidth \u0301lead"
    d["n_chars"][5] = len(d["text"][5])
    docs = pa.table({k: pa.array(v, docs.schema.field(k).type)
                     for k, v in d.items()})
    e = events.to_pydict()
    e["ts"][0] = -86400_000000 + 12345   # 1969-12-31 (+ a 1969 tie)
    e["ts"][1] = -86400_000000 + 12345
    e["user_id"][2] = -3
    e["value"][3], e["value"][4] = 1e8, -1e8
    # Non-finite measurements (sensor garbage / upstream 0-division):
    # ungated these hit CAST(non-finite AS BIGINT) — silent 0/LONG_MAX
    # in non-ANSI Spark, hard ConversionException in DuckDB — in every
    # quantizing value sum. Gated (-> NULL) at both scan choke points
    # (sources/tables.py::load_table, streaming _gate_epoch) and
    # mirrored by isfinite() in every value-reading oracle. -0.0 rides
    # along as signed-zero armor for the `+ 0E0` normalizations.
    e["value"][5] = float("nan")
    e["value"][6] = float("inf")
    e["value"][7] = float("-inf")
    e["value"][8] = -0.0
    events = pa.table({k: pa.array(v, events.schema.field(k).type)
                       for k, v in e.items()})
    return docs, events


def write_fuzz_corpus(seed: int, out_dir: str) -> str:
    """Write all ten tables, deterministic in the seed."""
    rng = random.Random(seed)
    docs, events = _apply_extremes(gen_documents(rng), gen_events(rng),
                                   rng)
    pq.write_table(docs, f"{out_dir}/documents.parquet")
    pq.write_table(events, f"{out_dir}/events.parquet")
    pq.write_table(_apply_embedding_extremes(gen_embeddings(rng)),
                   f"{out_dir}/embeddings.parquet")
    gen_tpch(random.Random(seed + 7000), out_dir)
    return out_dir
