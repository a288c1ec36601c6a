"""Language ID heuristic on real-language samples + quality kernel."""

import pyspark.sql.functions as F

from kg.textstats import detect_lang, lang_id, quality_features

SAMPLES = [
    ("the cat sat on the mat and it was happy with this", "en"),
    ("le chat est dans la maison avec une souris pour le fromage", "fr"),
    ("el gato es un animal que vive en la casa con los ninos", "es"),
    ("der hund ist ein tier und die katze ist nicht klein", "de"),
    ("今天天气很好我们一起去公园散步吧这是一个测试", "zh"),
]


def test_detect_lang_kernel():
    for text, want in SAMPLES:
        assert detect_lang(text) == want, text
    assert detect_lang("") == "und"
    assert detect_lang("zzz qqq xxx") == "und"


def test_lang_id_spark_path(spark):
    df = spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(SAMPLES)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["pred_lang"] for r in lang_id(df).collect()}
    assert got == {i: w for i, (_, w) in enumerate(SAMPLES)}


def test_quality_features(spark):
    df = spark.createDataFrame(
        [
            (1, "clean simple text with seven tokens here"),
            (2, "1 2 3 4 5 6 7 8 9 0 11 22"),
            (3, "x"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in quality_features(df).collect()}
    assert rows[1]["keep"] == 1
    assert rows[2]["keep"] == 0  # digit soup
    assert rows[3]["keep"] == 0  # too short
    assert rows[1]["n_tokens"] == 7
