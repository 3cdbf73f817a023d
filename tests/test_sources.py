"""Robust source readers (engine.sources) — reference S1/S2/S3 semantics."""

from engine.sources import (normalize_nulls, read_csv_lossy, read_csv_robust,
                            read_json_relation)


def test_read_csv_robust_comma(spark, tmp_path):
    p = tmp_path / "a.csv"
    p.write_text("a,b\n1,x\n2,y\n")
    df = read_csv_robust(spark, str(p))
    assert df.select("a", "b").count() == 2


def test_read_csv_robust_falls_back_to_pipe(spark, tmp_path):
    p = tmp_path / "p.csv"
    p.write_text("a|b|c\n1|x|q\n2|y|r\n3|z|s\n")
    df = read_csv_robust(spark, str(p))
    assert set(df.columns) >= {"a", "b", "c"}
    assert df.count() == 3


def test_read_csv_lossy_latin1(spark, tmp_path):
    p = tmp_path / "l.csv"
    p.write_bytes("a,b\n1,caf\xe9\n".encode("latin-1"))
    df = read_csv_lossy(spark, str(p))
    assert df.count() == 1
    assert df.first()["b"] == "café"


def test_normalize_nulls(spark):
    df = spark.createDataFrame(
        [("x",), ("nan",), ("-",), (" ",), ("Unknown",)], ["v"])
    out = normalize_nulls(df)
    assert out.filter("v is null").count() == 4


def test_read_json_relation_transposes(spark, tmp_path):
    p = tmp_path / "r.json"
    p.write_text('{"relation": [["city", "berlin", "paris"], '
                 '["pop", "3.6", "2.1"]]}')
    df = read_json_relation(spark, str(p))
    rows = {tuple(r) for r in df.select("city", "pop").collect()}
    assert rows == {("berlin", "3.6"), ("paris", "2.1")}
