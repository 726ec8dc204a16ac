"""Text-stats and similarity operator semantics (micro-fixtures + pure-
Python cross-checks)."""

import math

import pytest
from pyspark.sql import functions as F


def test_token_count_and_empty(spark):
    from table_ocr_spark.operators.textstats import token_count_col

    df = spark.createDataFrame(
        [("a b  c",), ("  x ",), ("",), ("   ",)], "text string"
    )
    got = [r.n for r in df.select(token_count_col("text").alias("n")).collect()]
    assert got == [3, 1, 0, 0]


def test_lang_id_markers(spark):
    from table_ocr_spark.operators.textstats import lang_id_col

    df = spark.createDataFrame(
        [
            ("the cat and the dog is here",),
            ("der hund und die katze ist nicht da",),
            ("le chat et la souris les voit",),
            ("el perro y los gatos una casa que",),
            ("这是中文文本",),
            ("xyzzy plugh",),
        ],
        "text string",
    )
    got = [r.l for r in df.select(lang_id_col("text").alias("l")).collect()]
    assert got == ["en", "de", "fr", "es", "zh", "unk"]


def test_quality_score_range_and_monotonicity(spark):
    from table_ocr_spark.operators.textstats import quality_score_col

    df = spark.createDataFrame(
        [("w",), (" ".join(["the word"] * 50),), ("!!!! ???? ####",)], "text string"
    )
    got = [r.q for r in df.select(quality_score_col("text").alias("q")).collect()]
    assert all(0.0 <= q <= 1.0 for q in got)
    assert got[1] > got[0]  # long stopwordy text scores higher than one token
    assert got[2] < got[1]  # special-char soup scores lower


def test_fingerprint_layout_insensitive(spark):
    from table_ocr_spark.operators.textstats import fingerprint_col

    df = spark.createDataFrame(
        [("Hello  World",), ("hello world",), ("hello\nworld",), ("other",)],
        "text string",
    )
    fps = [r.f for r in df.select(fingerprint_col("text").alias("f")).collect()]
    assert fps[0] == fps[1] == fps[2] != fps[3]


def _cos(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return dot / (na * nb)


VECS = [
    (0, [1.0, 0.0, 0.0, 0.0]),
    (1, [0.9, 0.1, 0.0, 0.0]),
    (2, [0.0, 1.0, 0.0, 0.0]),
    (3, [0.0, 0.0, 1.0, 0.0]),
    (4, [0.5, 0.5, 0.5, 0.5]),
]


@pytest.fixture(scope="module")
def vecs_df(spark):
    return spark.createDataFrame(VECS, "vec_id long, embedding array<double>")


def test_cosine_topk_matches_python(spark, vecs_df):
    from table_ocr_spark.operators.similarity import cosine_topk

    q = VECS[0][1]
    got = cosine_topk(vecs_df, q, k=3).collect()
    want = sorted(VECS, key=lambda v: (-_cos(v[1], q), v[0]))[:3]
    assert [r.vec_id for r in got] == [v[0] for v in want]
    for r, v in zip(got, want):
        assert abs(r.cos_sim - _cos(v[1], q)) < 1e-12


def test_lsh_topk_recalls_brute_force_top1(spark, vecs_df):
    from table_ocr_spark.operators.similarity import cosine_topk, cosine_topk_lsh

    q = [0.95, 0.05, 0.0, 0.0]
    brute = cosine_topk(vecs_df, q, k=1).collect()[0]
    lsh = cosine_topk_lsh(vecs_df, q, k=1, planes=4, max_hamming=1).collect()
    assert lsh and lsh[0].vec_id == brute.vec_id


def test_embedding_near_dup_pairs(spark, vecs_df):
    from table_ocr_spark.operators.similarity import embedding_near_dup_pairs

    pairs = {(r.key_a, r.key_b): r.cos_sim for r in embedding_near_dup_pairs(vecs_df, threshold=0.9).collect()}
    assert (0, 1) in pairs  # cos(v0, v1) ≈ 0.994
    assert (2, 3) not in pairs  # orthogonal


def test_redact_pii(spark):
    from table_ocr_spark.operators.textstats import redact_pii_col

    df = spark.createDataFrame(
        [
            ("mail a.b+c@x-y.co.uk now",),
            ("see https://a.io/p?q=1#z and http://b.c/d",),
            ("id 12345678 but zip 12345 stays",),
            ("clean text untouched",),
        ],
        "text string",
    )
    got = [r.r for r in df.select(redact_pii_col("text").alias("r")).collect()]
    assert got == [
        "mail <EMAIL> now",
        "see <URL> and <URL>",
        "id <NUM> but zip 12345 stays",
        "clean text untouched",
    ]


def test_dataset_split_deterministic_and_distributed(spark):
    """Hash split: reproducible across evaluations, ~90/5/5, and exact
    duplicates co-assign (content-fingerprint keyed → no train/test leak)."""
    from pyspark.sql import functions as F

    from table_ocr_spark.operators.textstats import dataset_split_col, fingerprint_col

    df = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc body number "), F.col("id").cast("string")).alias("text"),
    )
    split = dataset_split_col(fingerprint_col("text"))
    counts = {r["split"]: r["n"] for r in df.groupBy(split.alias("split")).agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > 0.85 * 2000 and counts["val"] > 0 and counts["test"] > 0
    a = df.select("doc_id", split.alias("s")).collect()
    b = df.select("doc_id", split.alias("s")).collect()
    assert sorted((r.doc_id, r.s) for r in a) == sorted((r.doc_id, r.s) for r in b)
    # duplicate content → same split regardless of doc_id
    dup = spark.createDataFrame(
        [(1, "same content"), (2, "same content")], "doc_id long, text string"
    )
    got = {r.s for r in dup.select(dataset_split_col(fingerprint_col("text")).alias("s")).collect()}
    assert len(got) == 1


def test_repetition_stats(spark):
    from table_ocr_spark.operators.textstats import dup_line_frac_col, top_bigram_share_col

    df = spark.createDataFrame(
        [
            (0, "header\nbody one\nheader\nbody two\nheader"),  # 5 lines, 3 distinct
            (1, "a b a b a b"),  # bigrams: ab ba ab ba ab → 'a b' x3 of 5
            (2, "all unique lines\nno repeats here"),
            (3, ""),
            (4, "one"),  # no bigrams
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.dl, r.tb)
        for r in df.select(
            "doc_id",
            dup_line_frac_col("text").alias("dl"),
            top_bigram_share_col("text").alias("tb"),
        ).collect()
    }
    assert got[0][0] == pytest.approx(1 - 3 / 5)
    assert got[1][1] == pytest.approx(3 / 5)
    assert got[2][0] == 0.0
    assert got[3] == (0.0, 0.0)
    assert got[4][1] == 0.0


def test_decontaminate_ngram_overlap(spark):
    from table_ocr_spark.operators.decontam import contaminated_keys, decontaminate

    train = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta"),   # shares 4-gram with eval
            (1, "one two three four five six seven"),     # clean
            (2, "ALPHA BETA GAMMA DELTA nothing else"),   # case-insensitive match
            (3, "alpha beta gamma"),                      # < n tokens: never contaminated
            (4, None),                                    # NULL text survives
        ],
        "doc_id long, text string",
    )
    eval_df = spark.createDataFrame(
        [(100, "intro words then alpha beta gamma delta closing")],
        "doc_id long, text string",
    )
    bad = {r.k for r in contaminated_keys(train, eval_df, n=4).collect()}
    assert bad == {0, 2}
    kept = {r.doc_id for r in decontaminate(train, eval_df, n=4).collect()}
    assert kept == {1, 3, 4}


def test_pack_sequences(spark):
    from table_ocr_spark.operators.textstats import pack_sequences

    df = spark.createDataFrame(
        [(i, 600) for i in range(10)], "doc_id long, n_tokens long"
    )
    got = pack_sequences(df, budget=1000, n_buckets=1).orderBy("doc_id").collect()
    # one bucket, 600-token docs into 1000-token bins: starts at 0,600,1200,…
    for i, r in enumerate(got):
        assert r.pack_bucket == 0
        assert r.seq_id == (600 * i) // 1000
        assert r.seq_offset == (600 * i) % 1000
    # bucketed variant: every doc gets exactly one slot, per-bucket seq_ids dense from 0
    many = pack_sequences(df, budget=1000, n_buckets=4).collect()
    assert len(many) == 10
    by_bucket = {}
    for r in many:
        by_bucket.setdefault(r.pack_bucket, []).append(r)
    for rows in by_bucket.values():
        rows.sort(key=lambda r: r.doc_id)
        cum = 0
        for r in rows:
            assert r.seq_id == cum // 1000 and r.seq_offset == cum % 1000
            cum += 600


def test_rebalance_mixture(spark):
    import hashlib

    from table_ocr_spark.operators.mixture import PPM, rebalance_mixture

    # 800 en, 150 de, 50 fr; targets 50/30/20 → binding group is fr:
    # n_out = 50/0.2 = 250 → keep ~125 en (of 800), ~75 de (of 150), ~50 fr
    rows = (
        [(i, "en") for i in range(800)]
        + [(1000 + i, "de") for i in range(150)]
        + [(2000 + i, "fr") for i in range(50)]
    )
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    targets = {"en": 0.5, "de": 0.3, "fr": 0.2}
    got = rebalance_mixture(df, targets, group="lang", key="doc_id").collect()

    # exact re-computation (independent): thresholds from integer arithmetic
    def h60(x):
        return int(hashlib.md5(str(x).encode()).hexdigest()[:15], 16)

    counts = {"en": 800, "de": 150, "fr": 50}
    shares = {g: int(round(s * PPM)) for g, s in targets.items()}
    n_out = min(c * PPM // shares[g] for g, c in counts.items())
    thr = {g: n_out * shares[g] // counts[g] for g in counts}
    expect = {(i, g) for i, g in rows if h60(i) % PPM < thr[g]}
    assert {(r.doc_id, r.lang) for r in got} == expect
    # the binding group (fr) keeps everything; others are subsampled
    by_lang = {}
    for r in got:
        by_lang[r.lang] = by_lang.get(r.lang, 0) + 1
    assert by_lang["fr"] == 50
    assert by_lang["en"] < 800 and by_lang["de"] < 150
    # untargeted groups drop entirely
    extra = df.union(spark.createDataFrame([(9999, "zz")], "doc_id long, lang string"))
    got2 = rebalance_mixture(extra, targets).collect()
    assert all(r.lang != "zz" for r in got2)


class TestNgramLmScore:
    """Corpus bigram-LM quality score (operators/lm.py): hand-checked
    stupid-backoff math, min_count pruning, broadcast-model equivalence."""

    def _df(self, spark):
        return spark.createDataFrame(
            [
                (1, "a b a b"),          # bigrams: ab, ba, ab
                (2, "a b c"),            # ab, bc
                (3, "z"),                # no bigrams
            ],
            "doc_id int, text string",
        )

    def test_hand_computed_backoff(self, spark):
        import math

        from table_ocr_spark.operators.lm import ngram_lm_score

        out = {r.doc_id: r for r in ngram_lm_score(self._df(spark)).collect()}
        # corpus: tokens a,b,a,b,a,b,c,z -> cu: a=3 b=3 c=1 z=1, T=8
        # bigrams: (a,b)x3 (b,a)x1 (b,c)x1
        lab = math.log(3 / 3)   # C(ab)/C(a) = 3/3
        lba = math.log(1 / 3)   # C(ba)/C(b)
        lbc = math.log(1 / 3)   # C(bc)/C(b)
        assert out[1].n_bigrams == 3
        assert out[1].lm_logprob == round((lab + lba + lab) / 3, 6)
        assert out[2].n_bigrams == 2
        assert out[2].lm_logprob == round((lab + lbc) / 2, 6)
        # <2 tokens: zero transitions, neutral score
        assert out[3].n_bigrams == 0 and out[3].lm_logprob == 0.0

    def test_min_count_prunes_to_backoff(self, spark):
        import math

        from table_ocr_spark.operators.lm import ngram_lm_score

        out = {
            r.doc_id: r
            for r in ngram_lm_score(self._df(spark), min_count=2).collect()
        }
        # only (a,b) (count 3) survives the pruned model; (b,a),(b,c)
        # back off: alpha * cu(w) / T
        lab = math.log(3 / 3)
        lba = math.log(0.4 * 3 / 8)
        lbc = math.log(0.4 * 1 / 8)
        assert out[1].lm_logprob == round((lab + lba + lab) / 3, 6)
        assert out[2].lm_logprob == round((lab + lbc) / 2, 6)

    def test_broadcast_model_equivalent(self, spark):
        from table_ocr_spark.operators.lm import ngram_lm_score

        a = ngram_lm_score(self._df(spark)).collect()
        b = ngram_lm_score(self._df(spark), broadcast_model=True).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))
        # broadcast mode: scoring joins build broadcast hash relations
        plan = ngram_lm_score(
            self._df(spark), broadcast_model=True
        )._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
