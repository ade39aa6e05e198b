"""Exact BPE tokenizer apply (operators/text.py): the pure-Python
trainer is the specification; the Spark replace-chain encode must agree
with a character-level reference encode, preserve the decode invariant,
and plug exact counts into packing / token-budget mixing."""

import pytest

from pramen_spark.operators.text import (
    BPE_SEP,
    bpe_encode,
    bpe_encode_vocab,
    bpe_train_merges,
    learn_bpe_merges,
)

SEP2 = BPE_SEP * 2


def _reference_encode(word: str, merges) -> list:
    """Classical greedy BPE encode: repeatedly merge the lowest-rank
    adjacent pair, leftmost-first within a rank. Independent of the
    replace-chain implementation."""
    ranks = {pair: i for i, pair in enumerate(merges)}
    toks = list(word)
    while True:
        best, best_rank = None, None
        for pair in zip(toks, toks[1:]):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = pair, r
        if best is None:
            return toks
        a, b = best
        out, i = [], 0
        while i < len(toks):
            if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(toks[i])
                i += 1
        toks = out


@pytest.fixture(scope="module")
def spark():
    from pramen_spark.session import build_session

    return build_session(
        master="local[4]", extra_conf={"spark.sql.shuffle.partitions": "4"}
    )


class TestTrainer:
    def test_learns_most_frequent_pair_first(self):
        merges = bpe_train_merges([("hello", 10), ("help", 5)], 1)
        # ('l','l') wt 10; ('h','e') and ('e','l') wt 15 -> ('e','l') vs
        # ('h','e'): tie at 15, lexicographic -> ('e','l')
        assert merges[0] == ("e", "l")

    def test_weighted_counts_include_run_overlaps(self):
        # 'aaa' contributes TWO (a,a) positions per instance
        merges = bpe_train_merges([("aaa", 3), ("ab", 5)], 1)
        assert merges[0] == ("a", "a")

    def test_merged_tokens_feed_later_rules(self):
        merges = bpe_train_merges([("abab", 10)], 3)
        assert merges == [("a", "b"), ("ab", "ab")]

    def test_deterministic(self):
        head = [("the", 50), ("then", 20), ("than", 20), ("ten", 10)]
        assert bpe_train_merges(head, 5) == bpe_train_merges(head, 5)

    def test_short_words_excluded(self):
        assert bpe_train_merges([("a", 100)], 3) == []


class TestFullVocabTrainer:
    """vocab_limit=None trains on the FULL weighted vocabulary via the
    incremental heap trainer — bit-identical to the reference trainer
    on the same vocabulary, and prefix-consistent with head-bounded
    training wherever the head's argmax agrees with the full one."""

    def test_vocab_limit_rejects_non_positive_values(self, spark):
        """Review r11: -1 used to be the internal 'not passed' sentinel,
        so a caller passing vocab_limit=-1 meaning 'unlimited' silently
        got head-bounded training. Non-positive limits now raise; None
        remains the full-vocabulary spelling."""
        import pytest

        df = spark.createDataFrame([(1, "aa bb aa")], "doc_id long, text string")
        for bad in (-1, 0, -5):
            with pytest.raises(ValueError, match="vocab_limit"):
                learn_bpe_merges(df, num_merges=2, vocab_limit=bad)

    def test_vocab_limit_rejects_bool(self, spark):
        """Advice r11: bool subclasses int, so True used to pass as
        limit 1 — heavily head-bounded training from a flag typo."""
        import pytest

        df = spark.createDataFrame([(1, "aa bb aa")], "doc_id long, text string")
        for bad in (True, False):
            with pytest.raises(ValueError, match="vocab_limit"):
                learn_bpe_merges(df, num_merges=2, vocab_limit=bad)
        with pytest.raises(ValueError, match="min_count"):
            learn_bpe_merges(
                df, num_merges=2, vocab_limit=None, min_count=True
            )
        with pytest.raises(ValueError, match="max_vocab"):
            learn_bpe_merges(
                df, num_merges=2, vocab_limit=None, max_vocab=True
            )

    def test_min_count_floor_engages_on_heavy_tail(self, spark):
        """Verdict r11 task 2: the full-vocabulary collect must be
        bounded by design. Synthetic heavy-tail corpus: 4 real words
        (weight >= 20) plus 60 hapax noise strings (URL-fragment
        shape). min_count=2 collapses the tail BEFORE the collect, and
        the trained merges equal training on the clean head alone —
        hapax noise cannot win a merge against real vocabulary."""
        head_docs = [(i, "banana bandana cabana canada") for i in range(20)]
        noise_docs = [
            (100 + i, f"x{i:02d}h{i * 7919 % 97:02d}q") for i in range(60)
        ]
        df = spark.createDataFrame(head_docs + noise_docs, ["doc_id", "text"])
        floored = learn_bpe_merges(
            df, num_merges=8, vocab_limit=None, min_count=2
        )
        clean = learn_bpe_merges(
            spark.createDataFrame(head_docs, ["doc_id", "text"]),
            num_merges=8,
            vocab_limit=None,
        )
        assert floored == clean
        # and the floor actually engaged: the unfloored vocabulary is
        # larger than max_vocab=4, so the cap trips without the floor
        with pytest.raises(ValueError, match="max_vocab"):
            learn_bpe_merges(df, num_merges=8, vocab_limit=None, max_vocab=4)
        # with the floor, the same cap of 4 admits the 4 real words
        capped = learn_bpe_merges(
            df, num_merges=8, vocab_limit=None, min_count=2, max_vocab=4
        )
        assert capped == clean

    def test_min_count_vacuous_floor_changes_nothing(self, spark):
        docs = [(i, "training data pipeline scale") for i in range(10)]
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        base = learn_bpe_merges(df, num_merges=10, vocab_limit=None)
        floored = learn_bpe_merges(
            df, num_merges=10, vocab_limit=None, min_count=5
        )
        uncapped = learn_bpe_merges(
            df, num_merges=10, vocab_limit=None, max_vocab=None
        )
        assert base == floored == uncapped

    def test_fast_trainer_equals_reference_on_random_corpora(self):
        import random

        from pramen_spark.operators.text import bpe_train_merges_fast

        rng = random.Random(42)
        for trial in range(60):
            vocab = [
                (
                    "".join(
                        rng.choice("abcde") for _ in range(rng.randint(1, 10))
                    ),
                    rng.randint(1, 20),
                )
                for _ in range(rng.randint(1, 60))
            ]
            nm = rng.randint(1, 30)
            assert bpe_train_merges(vocab, nm) == bpe_train_merges_fast(
                vocab, nm
            ), trial

    def test_full_equals_head_when_head_covers_vocab(self, spark):
        docs = [
            (i, " ".join(["training data pipeline scale"] * (1 + i % 3)))
            for i in range(10)
        ]
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        # 4 distinct words << 512: the head IS the full vocab
        full = learn_bpe_merges(df, num_merges=12, vocab_limit=None)
        head = learn_bpe_merges(df, num_merges=12, head_k=512)
        assert full == head and len(full) == 12

    def test_prefix_consistency_where_ranks_agree(self, spark):
        # head = 4 heavy words; tail = disjoint-alphabet words with
        # weight 1 that can never beat a head pair (weights >= 20), so
        # every argmax agrees and head-trained == full-trained exactly
        head_docs = [(i, "banana bandana cabana canada") for i in range(20)]
        tail_docs = [(100 + i, f"xyz{i % 7}qrst") for i in range(10)]
        df = spark.createDataFrame(head_docs + tail_docs, ["doc_id", "text"])
        full = learn_bpe_merges(df, num_merges=8, vocab_limit=None)
        head = learn_bpe_merges(df, num_merges=8, vocab_limit=4)
        assert full == head

    def test_divergence_only_where_tail_outweighs_head(self, spark):
        # the tail word dominates: full-vocab training must pick its
        # pair first while head-bounded (top-1) training cannot see it
        docs = [(0, "zz " * 50)] + [(i, "ab") for i in range(1, 40)]
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        full = learn_bpe_merges(df, num_merges=1, vocab_limit=None)
        head = learn_bpe_merges(df, num_merges=1, vocab_limit=1)
        assert full == [("z", "z")]  # 50 instances of zz beat 39 of ab
        assert head == [("z", "z")] or head == [("a", "b")]
        # and full-trained == reference-trained on the collected vocab
        from pyspark.sql import functions as F

        toks = F.expr("filter(split(lower(text), '[^a-z0-9]+'), x -> x != '')")
        vocab = [
            (r.w, r.c)
            for r in df.select(F.explode(toks).alias("w"))
            .where(F.length("w") >= 2)
            .groupBy("w")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        ]
        assert full == bpe_train_merges(vocab, 1)

    def test_full_vocab_trains_past_512_rules_and_applies_arrow(self, spark):
        import random

        from pramen_spark.operators.text import bpe_train_merges_fast

        rng = random.Random(3)
        vocab = [
            (
                "".join(
                    rng.choice("abcdefghij") for _ in range(rng.randint(3, 12))
                ),
                rng.randint(1, 30),
            )
            for _ in range(3000)
        ]
        merges = bpe_train_merges_fast(vocab, 600)
        assert len(merges) == 600
        # creation-order validation passes and auto routes to arrow
        df = spark.createDataFrame(
            [(w,) for w, _ in vocab[:50]], ["w"]
        ).distinct()
        got = {
            r.w: list(r.tokens)
            for r in bpe_encode_vocab(df, merges, engine="arrow").collect()
        }
        for w, toks in got.items():
            assert "".join(toks) == w


class TestEncodeVocab:
    WORDS = ["hello", "aaaa", "aaa", "ab", "x", "banana", "bananas"]

    def _encoded(self, spark, merges):
        df = spark.createDataFrame([(w,) for w in self.WORDS], ["w"])
        return {
            r.w: (list(r.tokens), r.n_tokens)
            for r in bpe_encode_vocab(df, merges).collect()
        }

    def test_matches_reference_encode(self, spark):
        merges = bpe_train_merges(
            [("hello", 5), ("aaaa", 4), ("banana", 3), ("ab", 2)], 8
        )
        got = self._encoded(spark, merges)
        for w in self.WORDS:
            ref = _reference_encode(w, merges)
            assert got[w] == (ref, len(ref)), (w, got[w], ref)

    def test_decode_invariant(self, spark):
        merges = bpe_train_merges([("banana", 9), ("aaa", 7), ("hello", 5)], 10)
        got = self._encoded(spark, merges)
        for w in self.WORDS:
            assert "".join(got[w][0]) == w

    def test_run_parity_leftmost_first(self, spark):
        got = self._encoded(spark, [("a", "a")])
        assert got["aaaa"][0] == ["aa", "aa"]
        assert got["aaa"][0] == ["aa", "a"]

    def test_no_merges_is_char_count(self, spark):
        got = self._encoded(spark, [])
        for w in self.WORDS:
            assert got[w] == (list(w), len(w))


class TestEncodeDocs:
    def test_per_doc_counts_and_wordless_docs(self, spark):
        df = spark.createDataFrame(
            [(1, "hello hello ab"), (2, "AAAA!"), (3, "...")],
            ["doc_id", "text"],
        )
        merges = [("l", "l"), ("a", "b"), ("a", "a"), ("aa", "aa")]
        rows = {r.doc_id: r for r in bpe_encode(df, merges).collect()}
        # hello -> h,e,ll,o (4); ab -> ab (1)
        assert (rows[1].n_words, rows[1].n_bpe_tokens) == (3, 9)
        # lowercased AAAA -> aaaa -> aa,aa -> aaaa (1 token)
        assert (rows[2].n_words, rows[2].n_bpe_tokens) == (1, 1)
        assert (rows[3].n_words, rows[3].n_bpe_tokens) == (0, 0)

    def test_learn_on_corpus_then_exact_counts_feed_packing(self, spark):
        docs = [
            (i, " ".join(["training data pipeline"] * (1 + i % 3)))
            for i in range(12)
        ]
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        merges = learn_bpe_merges(df, num_merges=10, head_k=16)
        assert len(merges) == 10
        counts = bpe_encode(df, merges)

        from pramen_spark.operators.packing import pack_sequences

        packed = pack_sequences(
            counts, budget=64, num_shards=2, token_count_col="n_bpe_tokens"
        )
        got = {r.doc_id: r.n_tokens for r in packed.collect()}
        want = {r.doc_id: r.n_bpe_tokens for r in counts.collect()}
        assert got == want

    def test_exact_counts_feed_token_budget_mix(self, spark):
        from pramen_spark.operators.sampling import sample_to_token_budget

        df = spark.createDataFrame(
            [(i, "en" if i % 2 else "de", "some shared words here") for i in range(20)],
            ["doc_id", "lang", "text"],
        )
        merges = learn_bpe_merges(df, num_merges=5, head_k=8)
        counts = bpe_encode(df, merges)
        enriched = df.join(counts.select("doc_id", "n_bpe_tokens"), "doc_id")
        out = sample_to_token_budget(
            enriched,
            {"en": 30},
            default_budget=20,
            num_buckets=4,
            token_count_col="n_bpe_tokens",
        ).collect()
        per_doc = {r.doc_id: r.n_bpe_tokens for r in counts.collect()}
        assert out, "budget selected nothing"
        for r in out:
            assert r.n_tokens == per_doc[r.doc_id]
            assert r.cum_tokens <= (30 if r.lang == "en" else 20)


class TestArrowEngine:
    """The Arrow engine (production-size merge tables) must agree with
    the replace-chain engine exactly."""

    def test_engines_agree_on_learned_corpus(self, spark):
        import numpy as np

        rng = np.random.RandomState(11)
        alphabet = "abcdefg"
        docs = [
            (
                i,
                " ".join(
                    "".join(rng.choice(list(alphabet), size=rng.randint(1, 12)))
                    for _ in range(20)
                ),
            )
            for i in range(30)
        ]
        from pramen_spark.operators.text import (
            bpe_encode_vocab,
            learn_bpe_merges,
        )

        df = spark.createDataFrame(docs, ["doc_id", "text"])
        merges = learn_bpe_merges(df, num_merges=60, head_k=128)
        assert len(merges) == 60
        from pyspark.sql import functions as F

        toks = F.expr("filter(split(lower(text), '[^a-z0-9]+'), x -> x != '')")
        vocab = df.select(F.explode(toks).alias("w")).distinct()
        a = {
            r.w: (list(r.tokens), r.n_tokens)
            for r in bpe_encode_vocab(vocab, merges, engine="replace").collect()
        }
        b = {
            r.w: (list(r.tokens), r.n_tokens)
            for r in bpe_encode_vocab(vocab, merges, engine="arrow").collect()
        }
        assert a == b

    def test_auto_picks_arrow_past_256(self, spark):
        # a fabricated >256-rule table must route through mapInPandas
        from pramen_spark.operators.text import bpe_encode_vocab

        # creation-ordered chain: rule i merges ("a"*(i+1), "a")
        merges = [("a" * (i + 1), "a") for i in range(300)]
        df = spark.createDataFrame([("aaaa",), ("ab",)], ["w"])
        out = bpe_encode_vocab(df, merges)  # auto -> arrow
        assert "mapInPandas" in out._jdf.queryExecution().logical().toString() or \
            "MapInPandas" in out._jdf.queryExecution().logical().toString()
        got = {r.w: list(r.tokens) for r in out.collect()}
        assert got == {"aaaa": ["aa", "aa"], "ab": ["a", "b"]}

    def test_kernel_matches_reference(self):
        from pramen_spark.operators.text import bpe_encode_word

        merges = [("a", "b"), ("ab", "c"), ("a", "a")]
        ranks = {p: i for i, p in enumerate(merges)}
        for w in ["abc", "aabc", "aaabab", "cab", "x", ""]:
            assert bpe_encode_word(w, ranks) == _reference_encode(w, merges) or (
                w == "" and bpe_encode_word(w, ranks) == []
            )

    def test_reordered_merge_table_rejected(self, spark):
        from pramen_spark.operators.text import bpe_encode_vocab

        df = spark.createDataFrame([("abc",)], ["w"])
        with pytest.raises(ValueError, match="creation order"):
            bpe_encode_vocab(df, [("ab", "c"), ("a", "b")])
