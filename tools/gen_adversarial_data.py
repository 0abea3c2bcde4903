"""Generate the ADVERSARIAL micro-corpus (VERDICT r15 item 2): the
driver's synthetic tables, same schemas and layout, with boundary
inputs injected — the input class that has actually produced bugs in
this repo (l89 float tie, l87 decimal overflow, l95 small-range bias)
is boundary values, not happy-path sf data.

Injected classes, by table:

documents (500 base + 84 adversarial):
  - empty text, whitespace-only (space / tab+newline / NBSP), and a
    zero-width-space-only doc (U+200B is NOT regex ``\\s`` — a doc
    that LOOKS blank but tokenizes to one "word" on both engines)
  - single-char docs incl. precomposed é, decomposed e+U+0301, a
    non-BMP math letter, CJK
  - unicode normalization pairs (NFC vs NFD of the same phrase),
    ligature ﬁ, Turkish dotted/dotless I, German ß vs SS, RTL with
    an embedded LTR number, stacked combining marks, ZWJ emoji
  - an 8-copy exact-duplicate cluster of a base doc (different
    doc_ids, different langs — survivor tie rules), a 5-copy cluster
    of a NEW text, a near-dup (one token changed) of a base doc
  - token-multiset twins: "tie alpha beta gamma" vs "gamma tie beta
    alpha" — DIFFERENT texts, IDENTICAL bag-of-words fingerprint
    (l96/l90 fingerprint semantics under reordering)
  - exact-tie token counts, punctuation-only, digits-only, CRLF/tab
    whitespace zoo, the full Java line-terminator set inside words
    (\\r NEL LS PS — the Java-vs-RE2 regex '.' divergence class, and
    Zl/Zp separators that must NOT collapse as \\p{Zs} spaces), a
    4096-char (power-of-two) doc, a 5000-repeat single-token doc
    (cap stress)
  - one adversarial doc re-keyed to doc_id 679 = 97·7 so the l96
    held-out set (doc_id % 97 == 0) contains an adversarial member
    (the empty-fingerprint doc)

embeddings (500 base + 12 = 512 = 2^9 rows, power-of-two manifest):
  - the zero vector (cosine 0/0 path), an exact copy of a base
    vector under a new vec_id (distance-tie with distinct ids),
    twin identical new vectors, all-ones, all-minus-ones, unit basis
    e0, tiny 1e-30 magnitudes, alternating ±1, and near-tie pairs

events (1000 base + 24 = 1024 = 2^10 rows):
  - user 9990: six events at the SAME microsecond (window/dedup tie),
    mixed types, two identical values
  - events at EXACT 5-minute tumbling-window boundaries (win-start
    inclusion), and a pair 1 µs either side of a boundary
  - duplicate full rows except event_id; exact value ties across
    users; value 0.0, -1.0, and a sub-cent 0.005; props "{}"

orders / lineitem / customer / supplier / part:
  - a childless customer (no orders) with an acctbal EXACTLY tying a
    base customer's; a supplier with acctbal 0.0; a part with size 0
    and a retailprice tying a base part
  - two new orders with EXACTLY tied o_totalprice at midnight
    boundary, one with NO lineitems
  - lineitems with discount 0.0 and 1.0 (zero revenue), tax 0,
    quantity ties, identical extendedprice twins

region/nation copy unchanged. Everything is literal/deterministic —
re-running reproduces byte-identical files. Output layout matches
/root/testdata (one parquet file per table, events.ts timestamp[us]),
so ``tools/check_correctness.py <out_dir>`` runs the full 195-lane
Spark-vs-DuckDB differential over it unchanged.

Usage:  python tools/gen_adversarial_data.py [out_dir]
        (default /tmp/spark_graft_adv)
"""

from __future__ import annotations

import os
import shutil
import sys
import unicodedata

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.001"

NBSP = " "
ZWSP = "​"
NEL = "\x85"
LS = "\u2028"
PS = "\u2029"


def _docs_rows(base: pd.DataFrame) -> pd.DataFrame:
    phrase_nfc = unicodedata.normalize("NFC", "café résumé naïve façade")
    phrase_nfd = unicodedata.normalize("NFD", phrase_nfc)
    base_text = base["text"].iloc[7]
    words = base_text.split()
    near_dup = " ".join(["CHANGED" if i == 3 else w for i, w in enumerate(words)])

    rows: list[tuple[str, str, str]] = []  # (text, lang, source)
    # blanks and single chars
    rows += [
        ("", "en", "src0"),
        (" ", "en", "src0"),
        ("\t\n ", "en", "src1"),
        (NBSP, "en", "src1"),
        (ZWSP, "en", "src2"),
        ("a", "en", "src2"),
        (".", "en", "src3"),
        ("é", "fr", "src3"),
        ("é", "fr", "src4"),
        ("\U0001d54a", "en", "src4"),
        ("中", "zh", "src5"),
    ]
    # unicode zoo
    rows += [
        (phrase_nfc, "fr", "src5"),
        (phrase_nfd, "fr", "src6"),
        ("ﬁne ﬂow oﬃce", "en", "src6"),
        ("İstanbul ısparta Iltur iltur", "en", "src7"),
        ("straße STRASSE strasse", "de", "src7"),
        ("שלום עולם 42 מספר", "en", "src8"),
        ("á̂̃̄ stacked", "en", "src8"),
        ("family \U0001f469‍\U0001f469‍\U0001f467 emoji "
         "\U0001f44d\U0001f3fd thumb", "en", "src9"),
    ]
    # duplicate clusters and near-dup
    langs = ["en", "de", "fr", "es", "zh"]
    rows += [(base_text, langs[i % 5], f"src{i % 20}") for i in range(8)]
    rows += [("the quick brown fox jumps over the lazy dog", langs[i % 5],
              f"src{(i + 3) % 20}") for i in range(5)]
    rows += [(near_dup, "en", "src10")]
    # token-multiset twins (same sorted-distinct-words fingerprint)
    rows += [
        ("tie alpha beta gamma", "en", "src11"),
        ("gamma tie beta alpha", "en", "src11"),
        ("alpha beta alpha beta", "en", "src12"),
        ("beta alpha beta alpha", "en", "src12"),
    ]
    # punctuation / digits / whitespace zoo / long docs
    rows += [
        ("!!! ??? ... ,,, ;;;", "en", "src13"),
        ("123 456 789 0 007", "en", "src13"),
        ("line1\nline2\r\nline3\ttab  double", "en", "src14"),
        # the FULL Java line-terminator set inside words: Java regex
        # '.' excludes \r NEL LS PS while RE2 excludes only \n (the
        # l93 class), and LS/PS are Zl/Zp — NOT Zs — so l94's
        # \p{Zs} collapse must leave them alone in both engines
        (f"nel{NEL}mid ls{LS}mid ps{PS}mid tail", "en", "src14"),
        (f"{LS}leading and trailing{PS}", "en", "src14"),
        ("x" * 4096, "en", "src14"),
        (("tok " * 5000).strip(), "en", "src15"),
    ]
    # exact-tie token counts, distinct texts
    rows += [
        ("one two three four five", "en", "src16"),
        ("uno dos tres cuatro cinco", "es", "src16"),
        ("eins zwei drei vier funf", "de", "src17"),
    ]
    # pad with distinct filler so the adversarial block is a stable size
    while len(rows) < 84:
        i = len(rows)
        rows.append((f"filler doc number {i} with shared shared tokens",
                     langs[i % 5], f"src{i % 20}"))

    start = int(base["doc_id"].max()) + 1  # 500
    out = pd.DataFrame(
        {
            "doc_id": range(start, start + len(rows)),
            "text": [r[0] for r in rows],
            "lang": [r[1] for r in rows],
            "source": [r[2] for r in rows],
        }
    )
    # the empty-text doc joins the l96 held-out set: doc_id 679 = 97*7
    assert out["doc_id"].max() < 679
    out.loc[out["text"] == "", "doc_id"] = 679
    out["n_chars"] = out["text"].str.len().astype("int64")
    return out


def _emb_rows(base: pd.DataFrame) -> pd.DataFrame:
    dim = len(base["embedding"].iloc[0])
    copy_of_base0 = [float(x) for x in base["embedding"].iloc[0]]
    twin = [0.5 if i % 3 == 0 else -0.25 for i in range(dim)]
    vecs = [
        [0.0] * dim,                                   # zero vector
        copy_of_base0,                                  # exact dup of vec 0
        twin, list(twin),                               # identical twins
        [1.0] * dim,
        [-1.0] * dim,
        [1.0] + [0.0] * (dim - 1),                      # unit basis e0
        [1e-30] * dim,                                  # tiny magnitude
        [1.0 if i % 2 == 0 else -1.0 for i in range(dim)],
        [-1.0 if i % 2 == 0 else 1.0 for i in range(dim)],  # antipode
        [0.1] * (dim - 1) + [0.1000001],                # near-tie pair...
        [0.1] * (dim - 1) + [0.1000002],                # ...1-ulp-ish apart
    ]
    start = int(base["vec_id"].max()) + 1  # 500
    assert len(vecs) == 12  # 500 base + 12 = 512 = 2^9 rows
    return pd.DataFrame(
        {
            "vec_id": range(start, start + len(vecs)),
            "embedding": vecs,
            "label": [i % 10 for i in range(len(vecs))],
        }
    )


def _event_rows(base: pd.DataFrame) -> pd.DataFrame:
    t0 = pd.Timestamp("2024-01-01 00:30:00")  # exact 5-min boundary
    same = pd.Timestamp("2024-01-01 00:12:34.567890")
    rows = []
    # user 9990: six events at the SAME microsecond
    for i, (et, v) in enumerate(
        [("click", 5.0), ("click", 5.0), ("view", 5.0), ("purchase", 7.25),
         ("error", 0.0), ("signup", -1.0)]
    ):
        rows.append((same, 9990, et, v, '{"k": 0}'))
    # exact tumbling boundaries and ±1 µs straddle
    rows += [
        (t0, 9991, "view", 1.0, '{"k": 1}'),
        (t0 - pd.Timedelta(microseconds=1), 9991, "view", 1.0, '{"k": 1}'),
        (t0 + pd.Timedelta(microseconds=1), 9991, "view", 1.0, '{"k": 1}'),
        (pd.Timestamp("2024-01-01 00:35:00"), 9991, "click", 2.0, "{}"),
        (pd.Timestamp("2024-01-01 01:00:00"), 9992, "purchase", 100.0, "{}"),
    ]
    # duplicate full rows except event_id; cross-user exact value ties
    rows += [
        (pd.Timestamp("2024-01-01 00:20:00.5"), 9993, "click", 3.5, '{"k": 2}'),
        (pd.Timestamp("2024-01-01 00:20:00.5"), 9993, "click", 3.5, '{"k": 2}'),
        (pd.Timestamp("2024-01-01 00:21:00"), 9994, "click", 3.5, '{"k": 3}'),
        (pd.Timestamp("2024-01-01 00:22:00"), 9995, "click", 3.5, '{"k": 4}'),
    ]
    # value boundaries, 1 µs session gaps
    rows += [
        (pd.Timestamp("2024-01-01 00:40:00"), 9996, "error", 0.0, "{}"),
        (pd.Timestamp("2024-01-01 00:40:00.000001"), 9996, "error", 0.005, "{}"),
        (pd.Timestamp("2024-01-01 00:40:00.000002"), 9996, "error", -1.0, "{}"),
    ]
    # pad to 24 adversarial rows → 1024 total (2^10)
    i = 0
    while len(rows) < 24:
        rows.append(
            (pd.Timestamp("2024-01-01 00:45:00") + pd.Timedelta(seconds=i),
             9997, "view", float(i), '{"k": 5}')
        )
        i += 1
    start = int(base["event_id"].max()) + 1
    return pd.DataFrame(
        {
            "event_id": range(start, start + len(rows)),
            "ts": [r[0] for r in rows],
            "user_id": [r[1] for r in rows],
            "event_type": [r[2] for r in rows],
            "value": [r[3] for r in rows],
            "props": [r[4] for r in rows],
        }
    )


def _relational_rows(tabs: dict[str, pd.DataFrame]) -> dict[str, pd.DataFrame]:
    out = {}
    cust, orders, li = tabs["customer"], tabs["orders"], tabs["lineitem"]
    part, supp = tabs["part"], tabs["supplier"]

    ck = int(cust["c_custkey"].max()) + 1
    out["customer"] = pd.DataFrame(
        [
            # childless customer whose acctbal EXACTLY ties a base row's
            {"c_custkey": ck, "c_name": "Customer#childless",
             "c_nationkey": int(cust["c_nationkey"].iloc[0]),
             "c_acctbal": float(cust["c_acctbal"].iloc[0]),
             "c_mktsegment": str(cust["c_mktsegment"].iloc[0])},
        ]
    )
    sk = int(supp["s_suppkey"].max()) + 1
    out["supplier"] = pd.DataFrame(
        [
            {"s_suppkey": sk, "s_name": "Supplier#zerobal",
             "s_nationkey": int(supp["s_nationkey"].iloc[0]),
             "s_acctbal": 0.0},
        ]
    )
    pk = int(part["p_partkey"].max()) + 1
    out["part"] = pd.DataFrame(
        [
            {"p_partkey": pk, "p_name": "adversarial size-zero part",
             "p_brand": str(part["p_brand"].iloc[0]),
             "p_type": str(part["p_type"].iloc[0]), "p_size": 0,
             "p_retailprice": float(part["p_retailprice"].iloc[0])},
        ]
    )
    ok = int(orders["o_orderkey"].max()) + 1
    midnight = pd.Timestamp("2024-06-01 00:00:00")
    out["orders"] = pd.DataFrame(
        [
            # exactly tied totalprice, same boundary date; #2 has NO lineitems
            {"o_orderkey": ok, "o_custkey": int(cust["c_custkey"].iloc[3]),
             "o_orderstatus": "O", "o_totalprice": 1000.0,
             "o_orderdate": midnight, "o_orderpriority": "1-URGENT"},
            {"o_orderkey": ok + 1, "o_custkey": int(cust["c_custkey"].iloc[4]),
             "o_orderstatus": "O", "o_totalprice": 1000.0,
             "o_orderdate": midnight, "o_orderpriority": "1-URGENT"},
        ]
    )
    ship = pd.Timestamp("2024-06-02 00:00:00")
    exist_pk = int(part["p_partkey"].iloc[0])
    exist_sk = int(supp["s_suppkey"].iloc[0])
    out["lineitem"] = pd.DataFrame(
        [
            # discount 1.0 → zero revenue; discount/tax 0; tied prices
            {"l_orderkey": ok, "l_partkey": exist_pk, "l_suppkey": exist_sk,
             "l_linenumber": 1, "l_quantity": 1.0, "l_extendedprice": 500.0,
             "l_discount": 1.0, "l_tax": 0.0, "l_returnflag": "N",
             "l_linestatus": "O", "l_shipdate": ship},
            {"l_orderkey": ok, "l_partkey": pk, "l_suppkey": sk,
             "l_linenumber": 2, "l_quantity": 1.0, "l_extendedprice": 500.0,
             "l_discount": 0.0, "l_tax": 0.0, "l_returnflag": "N",
             "l_linestatus": "O", "l_shipdate": ship},
        ]
    )
    return out


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_adv"
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir)

    names = ("region", "nation", "customer", "supplier", "part", "orders",
             "lineitem", "events", "documents", "embeddings")
    base_tables = {
        n: pq.read_table(f"{SRC}/{n}.parquet") for n in names
    }
    base_pd = {n: t.to_pandas() for n, t in base_tables.items()}

    extra = _relational_rows(base_pd)
    extra["documents"] = _docs_rows(base_pd["documents"])
    extra["embeddings"] = _emb_rows(base_pd["embeddings"])
    extra["events"] = _event_rows(base_pd["events"])

    for n in names:
        schema = base_tables[n].schema.remove_metadata()
        if n in extra:
            add = pa.Table.from_pandas(
                extra[n], schema=schema, preserve_index=False
            )
            tbl = pa.concat_tables(
                [base_tables[n].replace_schema_metadata(None).cast(schema), add]
            )
        else:
            tbl = base_tables[n].replace_schema_metadata(None)
        pq.write_table(tbl, f"{out_dir}/{n}.parquet")
        print(f"{n}: {tbl.num_rows} rows -> {out_dir}/{n}.parquet")


if __name__ == "__main__":
    main()
