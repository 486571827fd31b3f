"""Porter stemmer (F3 open-vocabulary path): golden cases from the
published algorithm (M.F. Porter 1980), Spark-UDF ≡ pycore parity on an
open vocabulary, and the stem_case_sql oracle surface."""

from __future__ import annotations

from pyspark.sql import functions as F

from searchengine_spark.functions.text import stem_case_sql, stem_tokens_udf
from searchengine_spark.operators import tfidf as TF
from searchengine_spark.pycore.stemmer import porter_stem

# Step-level behaviors straight from the paper, composed through the
# full pipeline where later steps don't re-touch the result.
GOLDEN = {
    # step 1a
    "caresses": "caress",
    "ponies": "poni",
    "ties": "ti",
    "caress": "caress",
    "cats": "cat",
    # step 1b (+cleanup)
    "feed": "feed",
    "plastered": "plaster",
    "bled": "bled",
    "motoring": "motor",
    "sing": "sing",
    "conflated": "conflat",  # at→ate then step 5a drops the e (m=2)
    "troubled": "troubl",
    "sized": "size",         # iz→ize; 5a keeps e (m=1, *o ends z... no:
    # "siz" ends z → cvc true? z not in wxy → *o holds → e kept)
    "hopping": "hop",
    "tanned": "tan",
    "falling": "fall",
    "hissing": "hiss",
    "failing": "fail",
    "filing": "file",
    # step 1c
    "happy": "happi",
    "sky": "sky",
    # step 2 (then later steps)
    "relational": "relat",       # →relate →step4 strips? m(rel)=1 not>1;
    # 5a: stem "relat" m=2>1 → drop e
    "conditional": "condit",     # →condition →ion (ends t, m>1)
    "rational": "ration",        # ational m(r)=0 → unchanged by step2;
    # step4 "al": stem "ration" m=2>1 → strip
    "valenci": "valenc",         # →valence; 5a m(valenc)=2 → drop e
    "digitizer": "digit",        # →digitize →step4 ize
    "operator": "oper",          # →operate →step4 ate
    "feudalism": "feudal",
    "decisiveness": "decis",     # →decisive →step4 ive
    "hopefulness": "hope",       # →hopeful →step3 ful
    "formaliti": "formal",
    # step 3
    "triplicate": "triplic",
    "formative": "form",
    "formalize": "formal",
    "electriciti": "electr",     # →electric →step4 ic (m=2)
    "electrical": "electr",
    "hopeful": "hope",
    "goodness": "good",
    # step 4
    "allowance": "allow",
    "inference": "infer",
    "airliner": "airlin",
    "adjustable": "adjust",
    "defensible": "defens",
    "irritant": "irrit",
    "replacement": "replac",
    "adjustment": "adjust",
    "dependent": "depend",
    "adoption": "adopt",
    "communism": "commun",
    "activate": "activ",
    "effective": "effect",
    # step 5
    "probate": "probat",
    "rate": "rate",
    "cease": "ceas",
    "controll": "control",
    "roll": "roll",
    # short tokens never stemmed
    "as": "as",
    "is": "is",
    "a": "a",
}


def test_golden_cases():
    bad = {
        w: (porter_stem(w), want)
        for w, want in GOLDEN.items()
        if porter_stem(w) != want
    }
    assert not bad, bad


def test_idempotent_on_fixture_vocab():
    from __spark_entry__ import FIXTURE_VOCAB

    for t in FIXTURE_VOCAB:
        s = porter_stem(t)
        assert s == s.lower()
        assert len(s) >= 1


OPEN_VOCAB = sorted(
    set(GOLDEN)
    | {
        "running", "runner", "easily", "flying", "dies", "mules",
        "denied", "agreed", "owned", "humbled", "meetings", "stating",
        "itemization", "sensational", "traditional", "reference",
        "colonizer", "plotted", "generalization", "oscillators",
        "national", "rational", "12abc", "x2ing", "don't", "o'clock",
    }
)


def test_spark_udf_parity_open_vocab(spark):
    """The distributed surface must be bit-identical to pycore on an
    open vocabulary (delegation makes this true by construction — the
    test guards the wiring, null handling and Arrow round-trip)."""
    rows = [(i, [w]) for i, w in enumerate(OPEN_VOCAB)] + [(999, None)]
    df = spark.createDataFrame(rows, "i bigint, toks array<string>")
    got = {
        r["i"]: r["s"]
        for r in df.select("i", stem_tokens_udf("toks").alias("s")).collect()
    }
    for i, w in enumerate(OPEN_VOCAB):
        assert got[i] == [porter_stem(w)], w
    assert got[999] is None


def test_stem_case_sql_matches_pycore(spark):
    """The oracle CASE surface replays pycore exactly on its vocabulary
    (checked through Spark SQL — same ANSI CASE DuckDB runs)."""
    vocab = ["merge", "query", "customer", "value", "table", "sort"]
    case = stem_case_sql("t", vocab)
    df = spark.createDataFrame([(w,) for w in vocab + ["unknown"]], "t string")
    got = {r["t"]: r["s"] for r in df.selectExpr("t", f"{case} AS s").collect()}
    for w in vocab:
        assert got[w] == porter_stem(w)
    assert got["unknown"] == "unknown"  # identity outside the vocabulary


def test_tf_stem_merges_counts(spark):
    """Stemming that maps two surface forms to one stem must COMBINE
    their tf counts (the same merge semantics the lemma path tests)."""
    df = spark.createDataFrame(
        [(1, "running runs runner walked")], "doc_id bigint, text string"
    )
    tf = TF.term_frequencies(TF.doc_tokens(df, stem=True))
    got = {r["token"]: r["tf"] for r in tf.collect()}
    # running→run, runs→run merge; runner→runner (m(runn)=1 not >1)
    assert abs(got["run"] - 2 / 4) < 1e-12
    assert abs(got["runner"] - 1 / 4) < 1e-12
    assert abs(got["walk"] - 1 / 4) < 1e-12
