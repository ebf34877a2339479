"""BPE tokenizer training (operators/bpe.py): the full merge loop vs
a pure-Python reference implementing the same greedy algorithm —
count weighted adjacent pairs over the vocabulary, argmax with
lexicographic tiebreak, apply left-to-right non-overlapping, repeat.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from ecommerce_lakehouse_platform_spark.operators.bpe import (
    apply_merges,
    train_bpe,
)


def _ref_merge(tokens: list[str], pa: str, pb: str) -> list[str]:
    out: list[str] = []
    i = 0
    while i < len(tokens):
        if i + 1 < len(tokens) and tokens[i] == pa and tokens[i + 1] == pb:
            out.append(pa + pb)
            i += 2
        else:
            out.append(tokens[i])
            i += 1
    return out


def _ref_train(corpus: list[str], n_merges: int, min_pair_count: int = 2):
    wf = Counter(
        w for line in corpus for w in line.split(" ") if len(w) >= 2
    )
    vocab = {w: list(w) for w in wf}
    merges = []
    for _ in range(n_merges):
        counts: Counter = Counter()
        for w, toks in vocab.items():
            for a, b in zip(toks, toks[1:]):
                counts[(a, b)] += wf[w]
        if not counts:
            break
        # count desc, then (left, right) lexicographic — the engine's
        # deterministic tiebreak
        (pa, pb), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < min_pair_count:
            break
        merges.append((pa, pb, cnt))
        vocab = {w: _ref_merge(t, pa, pb) for w, t in vocab.items()}
    return merges, vocab, wf


CORPUS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "wider wider new new banana",
    "aaaa aaa banana bandana",
]


def test_train_bpe_matches_reference(spark):
    """The distributed trainer's merge table (pairs, order, weighted
    counts) and final per-word token arrays equal the pure-Python
    reference's, including the greedy non-overlap case ('aaaa' with
    merge (a,a) -> [aa, aa], 'aaa' -> [aa, a])."""
    docs = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    merges, state = train_bpe(docs, n_merges=8)
    ref_merges, ref_vocab, _ = _ref_train(CORPUS, 8)
    assert merges == ref_merges
    got = {r["word"]: list(r["toks"]) for r in state.collect()}
    assert got == ref_vocab
    # the greedy-fold contract, explicitly
    if ("a", "a", 5) in merges or any(m[:2] == ("a", "a") for m in merges):
        assert got["aaaa"].count("aa") == 2
        assert got["aaa"] == ["aa", "a"]


def test_train_bpe_early_stop_and_apply(spark):
    """Early stop: once no pair reaches min_pair_count the loop ends
    short; apply_merges replays the trained ladder onto raw character
    arrays and reproduces the trainer's final tokenization (the
    encode half == the train half)."""
    docs = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    merges, state = train_bpe(docs, n_merges=500)
    ref_merges, ref_vocab, _ = _ref_train(CORPUS, 500)
    assert merges == ref_merges
    assert len(merges) < 500, "must stop when pairs dry up"

    encoded = state.select(
        "word",
        apply_merges(
            F.regexp_extract_all(F.col("word"), F.lit("."), 0), merges
        ).alias("enc"),
        "toks",
    )
    bad = encoded.filter(F.col("enc") != F.col("toks")).count()
    assert bad == 0, "encode(merges) must equal the trained tokenization"


def test_train_bpe_plan_is_vocab_sized(spark):
    """Scale-shape pin: after the one corpus scan, each iteration's
    pair count runs over the vocabulary relation; the merge
    application is a map-side fold (no UDF, no extra shuffle) —
    assert no Python eval nodes anywhere in the encode expression."""
    docs = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    merges, state = train_bpe(docs, n_merges=3)
    plan = state.select(
        apply_merges(F.col("toks"), merges).alias("enc")
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_merge_fold_property_random_sequences(spark):
    """Property: for random token sequences and random pairs, the JVM
    fold equals the pure-Python greedy scanner — including repeated
    and overlapping occurrences, pair-at-boundary, and no-match."""
    from hypothesis import given, settings, strategies as st

    from ecommerce_lakehouse_platform_spark.operators.bpe import _merge_pair

    alphabet = ["a", "b", "ab", "ba"]
    seqs = st.lists(
        st.lists(st.sampled_from(alphabet), min_size=0, max_size=8),
        min_size=1,
        max_size=12,
    )
    pairs = st.tuples(st.sampled_from(alphabet), st.sampled_from(alphabet))

    @settings(max_examples=12, deadline=None)
    @given(seqs=seqs, pair=pairs)
    def check(seqs, pair):
        pa, pb = pair
        df = spark.createDataFrame(
            [(i, s) for i, s in enumerate(seqs)],
            "i int, toks array<string>",
        )
        got = {
            r["i"]: list(r["m"])
            for r in df.select(
                "i", _merge_pair(F.col("toks"), pa, pb).alias("m")
            ).collect()
        }
        assert got == {i: _ref_merge(s, pa, pb) for i, s in enumerate(seqs)}

    check()


def test_word_frequencies_split_all_whitespace(spark):
    """Tabs/newlines delimit words like spaces do: a word must never
    contain whitespace the downstream '.'-charsplit (which does not
    match newlines) would silently drop."""
    from ecommerce_lakehouse_platform_spark.operators.bpe import (
        word_frequencies,
    )

    docs = spark.createDataFrame(
        [("a", "low\tlower\nnewest low"), ("b", "low  newest")],
        ["doc_id", "text"],
    )
    got = {
        r["word"]: r["freq"]
        for r in word_frequencies(docs).collect()
    }
    assert got == {"low": 3, "lower": 1, "newest": 2}
