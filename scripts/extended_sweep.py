"""Per-round extended-seed differential sweep (SURVEY §5.10's
"discovery engine"), as a permanent script instead of a /tmp one-off.

The committed differential tier (`tests/test_differential.py`) pins a
fixed seed set per corpus family; this sweep replays the SAME operator
x generator matrix on FRESH seeds each round, plus two families the
committed tier doesn't carry as pytest cases:

* plagiarism — shared passages relocated across documents, verbatim
  copies, one-token edits (the shapes the fingerprint/near-dup joins
  exist for; found nothing new in r8/r9 but is the family that WOULD
  catch a tie-break or df-prune divergence in them);
* volume — per-entity volume stress at CORRECTNESS level (book-length
  documents, a hot event key): the r9 quadratic fixes were verified
  bit-identical on these shapes; this keeps them engine-equal as the
  operators evolve.  (Wall-clock linearity is pinned separately in
  tests/test_latents.py — this sweep checks equality, not speed.)

Usage:
    python scripts/extended_sweep.py --offset 1000 [--seeds 3]
                                     [--families docs,events,...]

`--offset` shifts every family's seed base; use a fresh offset per
round (r10 used 1000) so sweep seeds never repeat a committed seed or
a prior round's sweep.  Exit 0 = zero divergences.
"""
from __future__ import annotations

import argparse
import datetime as dt
import random
import shutil
import sys
import tempfile
import time

import duckdb

sys.path.insert(0, "/root/repo")

from mvp_mini_etl_pipeline_1762911573_spark.registry import (  # noqa: E402
    all_oracles, all_queries,
)
from mvp_mini_etl_pipeline_1762911573_spark.session import get_spark  # noqa: E402
from tests import test_differential as td  # noqa: E402
from tests.oracle_utils import compare  # noqa: E402

EVENT_SCHEMA = ("event_id long, ts timestamp_ntz, user_id long, "
                "event_type string, value double, props string")
DOC_SCHEMA = ("doc_id long, text string, lang string, source string, "
              "n_chars long")


# ---------------------------------------------------------------------------
# sweep-only corpus families (not in the committed tier)
# ---------------------------------------------------------------------------

def _pseudo_words(rng: random.Random, n: int) -> list[str]:
    """A bigger vocabulary than td.WORDS so fingerprints/shingles have
    room to differ between unrelated docs (td.WORDS' 13 words make
    EVERY doc pair a near-dup, which drowns the planted signal)."""
    syll = ["ka", "ro", "mi", "ta", "lu", "ne", "zo", "ba", "qui", "ver",
            "sol", "dun", "mar", "pel", "tig", "ral"]
    return ["".join(rng.choices(syll, k=rng.randint(2, 4)))
            for _ in range(n)]


def gen_plagiarism(seed: int, n: int = 120):
    """Plagiarism shapes (r8 family): a base corpus of unrelated docs,
    then planted (a) verbatim copies under a different doc_id/source,
    (b) shared passages relocated into a different host doc, and
    (c) one-token-edited copies — each pair spanning sources so
    cross-source audits (mirror_detect, source_overlap) see them."""
    rng = random.Random(seed)
    vocab = _pseudo_words(rng, 400)
    rows = []
    for i in range(n):
        text = " ".join(rng.choices(vocab, k=rng.randint(15, 80)))
        rows.append([i, text, rng.choice(["en", "de", "fr"]),
                     f"src{rng.randint(1, 4)}"])
    base_n = len(rows)
    nxt = base_n
    # (a) verbatim copies of ~8 docs
    for _ in range(8):
        src = rows[rng.randrange(base_n)]
        rows.append([nxt, src[1], src[2], f"src{rng.randint(1, 4)}"])
        nxt += 1
    # (b) relocated shared passages: splice 12-24 tokens of A into B
    for _ in range(8):
        a = rows[rng.randrange(base_n)][1].split()
        b = rows[rng.randrange(base_n)][1].split()
        if len(a) < 14 or len(b) < 4:
            continue
        k = rng.randint(12, min(24, len(a)))
        start = rng.randrange(len(a) - k + 1)
        passage = a[start:start + k]
        pos = rng.randrange(len(b))
        merged = b[:pos] + passage + b[pos:]
        rows.append([nxt, " ".join(merged), rng.choice(["en", "de"]),
                     f"src{rng.randint(1, 4)}"])
        nxt += 1
    # (c) one-token edits of copies
    for _ in range(8):
        src = rows[rng.randrange(base_n)]
        toks = src[1].split()
        if not toks:
            continue
        toks[rng.randrange(len(toks))] = rng.choice(vocab)
        rows.append([nxt, " ".join(toks), src[2],
                     f"src{rng.randint(1, 4)}"])
        nxt += 1
    return [(r[0], r[1], r[2], r[3], len(r[1])) for r in rows]


#: plagiarism family ops: the near-dup / novelty / fertility set the
#: r9 sweep ran (15 ops), plus the r10 doc debuts that read the same
#: surfaces.  All oracle-backed and documents-only.
PLAG_OPS = ["dedup_ngram_jaccard", "dedup_containment", "substring_dedup",
            "doc_fingerprint", "winnow_fingerprint", "winnow_join",
            "winnow_coverage", "simhash_join", "ngram_novelty",
            "novelty_delta", "token_fertility", "decontaminate",
            "decontaminate_filter", "join_prefix_filter", "mirror_detect",
            "host_dedup", "source_overlap", "crawl_frontier",
            "source_perplexity"]


def gen_book_docs(seed: int, n_books: int = 6, tokens: int = 30_000):
    """Book-length documents (r9 volume family, correctness flavor):
    half low-vocab repetition books, half wide-vocab books, plus a few
    normal docs so df thresholds engage."""
    rng = random.Random(seed)
    wide = _pseudo_words(rng, 5000)
    rows = []
    for i in range(n_books):
        if i % 2 == 0:
            vocab = rng.sample(wide, 12)          # repetition book
        else:
            vocab = wide                          # wide-vocab book
        text = " ".join(rng.choices(vocab, k=tokens))
        rows.append((i, text, "en", f"src{i % 3 + 1}", len(text)))
    for i in range(n_books, n_books + 30):
        text = " ".join(rng.choices(wide, k=rng.randint(10, 60)))
        rows.append((i, text, rng.choice(["en", "de"]),
                     f"src{i % 4 + 1}", len(text)))
    return rows


#: volume-docs ops: the operators whose r9 quadratic fixes must stay
#: bit-identical on book-length inputs (plus the r10 winnow debut).
BOOK_OPS = ["text_repetition", "doc_chunk", "collapse_repeats",
            "winnow_fingerprint", "winnow_coverage", "doc_fingerprint",
            "text_entropy", "token_count", "lm_score", "text_stats"]


def gen_hot_key_events(seed: int, n_hot: int = 50_000, n_bg: int = 500):
    """One user with n_hot events over a few days (the r9 hot-key
    family, correctness flavor) over a normal background corpus."""
    rng = random.Random(seed)
    rows = []
    ts = dt.datetime(2024, 3, 1)
    for i in range(n_hot):
        ts += dt.timedelta(microseconds=rng.randint(1, 30_000_000))
        rows.append((i, ts, 1, rng.choice(td.TYPES),
                     round(rng.uniform(0, 100), 2),
                     '{"k": %d}' % rng.randint(0, 99)))
    ts = dt.datetime(2024, 3, 1)
    for i in range(n_hot, n_hot + n_bg):
        ts += dt.timedelta(microseconds=rng.randint(1, 2_000_000_000))
        rows.append((i, ts, rng.randint(2, 8), rng.choice(td.TYPES),
                     round(rng.uniform(0, 100), 2),
                     '{"k": %d}' % rng.randint(0, 99)))
    return rows


#: hot-key ops: the RANGE-frame / per-key window surfaces the r9
#: rate-limit rewrite covers, kept engine-equal at volume.
HOT_OPS = ["events_rate_limit", "events_debounce", "window_running_sum",
           "events_sessionize", "window_lag", "window_fill_forward",
           "rolling_mau", "window_rolling_median"]


# ---------------------------------------------------------------------------
# family table: name -> (writer(spark, dir, seed) -> [tables], ops)
# ---------------------------------------------------------------------------

def _write(spark, d, table, rows, schema, parts=2):
    spark.createDataFrame(rows, schema).coalesce(parts) \
        .write.parquet(f"{d}/{table}.parquet")


def _w_events(spark, d, seed):
    _write(spark, d, "events", td._gen_events(seed), EVENT_SCHEMA)
    return ["events"]


def _w_docs(spark, d, seed):
    _write(spark, d, "documents", td._gen_docs(seed), DOC_SCHEMA)
    return ["documents"]


def _w_emb(spark, d, seed):
    _write(spark, d, "embeddings", td._gen_embeddings(seed),
           "vec_id long, embedding array<float>, label int")
    return ["embeddings"]


def _w_pre1970(spark, d, seed):
    _write(spark, d, "events", td._gen_events_pre1970(seed), EVENT_SCHEMA)
    return ["events"]


def _w_hostile(spark, d, seed):
    _write(spark, d, "events", td._gen_events_hostile(seed), EVENT_SCHEMA)
    return ["events"]


def _w_rel(spark, d, seed):
    orders, cust = td._gen_orders_customer(seed)
    _write(spark, d, "orders", orders,
           "o_orderkey long, o_custkey long, o_orderstatus string, "
           "o_totalprice double, o_orderdate timestamp_ntz, "
           "o_orderpriority string")
    _write(spark, d, "customer", cust,
           "c_custkey long, c_name string, c_nationkey int, "
           "c_acctbal double, c_mktsegment string", parts=1)
    _write(spark, d, "nation",
           [(i, f"NATION{i:02d}", i % 5) for i in range(25)],
           "n_nationkey int, n_name string, n_regionkey int", parts=1)
    # dq_check audits events.value_finite (r12) — ship the HOSTILE
    # events corpus alongside the relational tables so the counter's
    # non-zero path is exercised here too (r13 advice item: this
    # line previously wrote the all-finite corpus, leaving the new
    # check at 0 in the relational sweep)
    _write(spark, d, "events", td._gen_events_hostile(seed),
           EVENT_SCHEMA)
    return ["orders", "customer", "nation", "events"]


def _w_line(spark, d, seed):
    _write(spark, d, "lineitem", td._gen_lineitem(seed),
           "l_orderkey long, l_partkey long, l_suppkey long, "
           "l_linenumber int, l_quantity double, l_extendedprice double, "
           "l_discount double, l_tax double, l_returnflag string, "
           "l_linestatus string, l_shipdate timestamp_ntz")
    _write(spark, d, "part", td._gen_part(seed),
           "p_partkey long, p_name string, p_brand string, "
           "p_type string, p_size int, p_retailprice double", parts=1)
    rng = random.Random(seed * 100)
    _write(spark, d, "orders",
           [(k, rng.choice(["F", "O", "P"]),
             rng.choice([100.0, 100.0, 0.0, -5.0, 250.5,
                         round(rng.uniform(10, 2000), 2)]))
            for k in range(1, 141)],
           "o_orderkey long, o_orderstatus string, o_totalprice double",
           parts=1)
    return ["lineitem", "part", "orders"]


def _w_plag(spark, d, seed):
    _write(spark, d, "documents", gen_plagiarism(seed), DOC_SCHEMA)
    return ["documents"]


def _w_books(spark, d, seed):
    _write(spark, d, "documents", gen_book_docs(seed), DOC_SCHEMA)
    return ["documents"]


def _w_hot(spark, d, seed):
    _write(spark, d, "events", gen_hot_key_events(seed), EVENT_SCHEMA)
    return ["events"]


FAMILIES = {
    "events": (_w_events, lambda: td.EVENT_OPS + td.EVENT_OPS_EXTRA, 0),
    "docs": (_w_docs, lambda: td.DOC_OPS, 100),
    "emb": (_w_emb, lambda: td.EMB_OPS, 200),
    "pre1970": (_w_pre1970, lambda: td.NEG_EPOCH_OPS, 300),
    "hostile": (_w_hostile, lambda: td.HOSTILE_VALUE_OPS, 400),
    "rel": (_w_rel, lambda: td.REL_OPS, 500),
    "line": (_w_line, lambda: td.LINE_OPS + td.PART_OPS, 600),
    "plagiarism": (_w_plag, lambda: PLAG_OPS, 700),
    "books": (_w_books, lambda: BOOK_OPS, 800),
    "hotkey": (_w_hot, lambda: HOT_OPS, 900),
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--offset", type=int, required=True,
                    help="per-round seed offset (fresh each round)")
    ap.add_argument("--seeds", type=int, default=3,
                    help="seeds per family")
    ap.add_argument("--families", default=",".join(FAMILIES),
                    help="comma list of families to run")
    args = ap.parse_args()

    fams = [f.strip() for f in args.families.split(",") if f.strip()]
    unknown = set(fams) - set(FAMILIES)
    if unknown:
        ap.error(f"unknown families: {sorted(unknown)}")

    spark = get_spark("extended-sweep")
    queries, oracles = all_queries(), all_oracles()

    cases = passes = 0
    failures: list[str] = []
    t_start = time.monotonic()
    root = tempfile.mkdtemp(prefix="extsweep_")
    try:
        for fam in fams:
            writer, ops_fn, fam_base = FAMILIES[fam]
            ops = ops_fn()
            for s in range(args.seeds):
                seed = args.offset + fam_base + s
                d = f"{root}/{fam}{seed}"
                tables = writer(spark, d, seed)
                con = duckdb.connect()
                for t in tables:
                    con.execute(
                        f"CREATE VIEW {t} AS SELECT * "
                        f"FROM '{d}/{t}.parquet/*.parquet'")
                for name in ops:
                    if name not in oracles:
                        continue  # rows-only ops have no oracle to diff
                    cases += 1
                    t0 = time.monotonic()
                    try:
                        compare(queries[name](spark, d), con,
                                oracles[name], f"{name}@{fam}{seed}")
                        passes += 1
                        print(f"ok   {fam}@{seed} {name} "
                              f"({time.monotonic()-t0:.1f}s)", flush=True)
                    except Exception as e:  # noqa: BLE001
                        failures.append(f"{fam}@{seed} {name}: {e}")
                        print(f"FAIL {fam}@{seed} {name}: {e}", flush=True)
                con.close()
    finally:
        shutil.rmtree(root, ignore_errors=True)

    print(f"\nextended sweep: {passes}/{cases} ok "
          f"({time.monotonic()-t_start:.0f}s, offset={args.offset}, "
          f"seeds/family={args.seeds}, families={','.join(fams)})")
    if failures:
        print("DIVERGENCES:")
        for f in failures:
            print("  " + f)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
