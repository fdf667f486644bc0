"""Model-based quality classifier (quality_model.py): the trained filter
must separate clean prose from noise, score deterministically for a fixed
seed corpus, and gate documents the way the CCNet/GPT-3 pipeline does."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cnosdb_spark.operators import quality_model


GOOD = [
    "the quick brown fox jumps over the lazy dog and runs into the forest",
    "she walked to the market in the morning and bought fresh bread for the family",
    "a history of the region shows that trade routes shaped the growth of its cities",
    "the committee agreed that the proposal should be reviewed again in the spring",
    "after the rain stopped the children went outside to play in the garden",
    "he read the letter twice before placing it carefully back on the desk",
    "the results of the experiment were consistent with the original hypothesis",
    "many travelers have described the valley as one of the most beautiful places",
    "the library was quiet except for the sound of pages turning slowly",
    "economic growth depends on investment in education and public infrastructure",
]

BAD = [
    "xjq9 zzk4!! @@##$$ 77421 qqpl 00x !!@@ 9932 kk",
    "BUY NOW!!! $$$ 100% FREE!!! CLICK >>> http 12345 67890 $$$",
    "aaaaaaa bbbbbbb ccccccc 1111111 2222222 3333333 zzzzzzz",
    "%%%% ^^^^ &&&& **** (((( )))) ____ ++++ ==== ;;;;",
    "lorem1 ipsum2 dolor3 sit4 amet5 99999 88888 77777 xx yy zz",
    "qwertyuiop asdfghjkl zxcvbnm 0987654321 !!!??? ###",
    "k k k k k k k k k k 1 1 1 1 1 1 1 1 1 1",
    "ZZZZ9999 XXXX8888 CCCC7777 VVVV6666 BBBB5555 NNNN4444",
    "@@@@@@ 123123123 ??????? abcabcabc !!!!!!! 456456456",
    "x1 x2 x3 x4 x5 x6 x7 x8 x9 x0 #$ #$ #$ #$ #$",
]


@pytest.fixture(scope="module")
def model(spark):
    pos = spark.createDataFrame([(t,) for t in GOOD], ["text"])
    neg = spark.createDataFrame([(t,) for t in BAD], ["text"])
    return quality_model.train_quality_classifier(pos, neg, num_features=512)


def test_classifier_separates_prose_from_noise(spark, model):
    test_good = spark.createDataFrame(
        [
            (1, "the old bridge across the river was rebuilt by the town last year"),
            (2, "students in the class discussed the book they had read over the summer"),
        ],
        ["doc_id", "text"],
    )
    test_bad = spark.createDataFrame(
        [
            (3, "zz99 !!@@ 4455 qq ## pp 8899 xx !! ## 77"),
            (4, "$$$$ 0000 %%%% 1111 ^^^^ 2222 &&&& 3333"),
        ],
        ["doc_id", "text"],
    )
    g = quality_model.score_quality(test_good, model).collect()
    b = quality_model.score_quality(test_bad, model).collect()
    assert all(r["quality_prob"] > 0.5 for r in g), g
    assert all(r["quality_prob"] < 0.5 for r in b), b
    # held-out prose scores strictly above held-out noise
    assert min(r["quality_prob"] for r in g) > max(r["quality_prob"] for r in b)


def test_scores_deterministic_and_partition_stable(spark, model):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(GOOD + BAD)], ["doc_id", "text"]
    )
    a = {r["doc_id"]: r["quality_prob"] for r in quality_model.score_quality(docs, model).collect()}
    b = {
        r["doc_id"]: r["quality_prob"]
        for r in quality_model.score_quality(docs.repartition(7), model).collect()
    }
    assert a == b


def test_filter_gates_and_keeps_schema(spark, model):
    docs = spark.createDataFrame(
        [(i, t, f"src{i % 2}") for i, t in enumerate(GOOD + BAD)],
        ["doc_id", "text", "source"],
    )
    kept = quality_model.filter_by_quality(docs, model, threshold=0.5)
    assert set(kept.columns) == {"doc_id", "text", "source", "quality_prob"}
    ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    # training docs re-scored: all prose kept, all noise dropped
    assert ids == set(range(len(GOOD)))


def test_scoring_plan_is_narrow(spark, model):
    """Scoring must not shuffle: HashingTF + model transform are per-row."""
    docs = spark.createDataFrame([(1, "some plain text here")], ["doc_id", "text"])
    p = (
        quality_model.score_quality(docs, model)
        ._jdf.queryExecution()
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
        )
    )
    assert "Exchange" not in p


def test_model_save_load_roundtrip(spark, model, tmp_path):
    """A loaded model scores byte-identically to the in-session one —
    the train-once / score-every-batch contract."""
    docs = spark.createDataFrame(
        [
            (1, "the museum opened a new exhibit about the history of navigation"),
            (2, "zz!! 11 @@ 22 ## 33 qq $$ 44 %% 55"),
        ],
        ["doc_id", "text"],
    )
    before = {
        r["doc_id"]: r["quality_prob"]
        for r in quality_model.score_quality(docs, model).collect()
    }
    path = str(tmp_path / "qmodel")
    quality_model.save_quality_model(model, path)
    loaded = quality_model.load_quality_model(path)
    after = {
        r["doc_id"]: r["quality_prob"]
        for r in quality_model.score_quality(docs, loaded).collect()
    }
    assert before == after
