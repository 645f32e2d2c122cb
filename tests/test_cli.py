"""End-to-end CLI round trip: gen → select on both encodings, identity
check printed (the reference CLI's own correctness story, SURVEY §5)."""

from __future__ import annotations

import csv

import pytest

from spark_ifs_spark.cli import main


def test_gen_writes_consistent_encodings(tmp_path):
    conv = tmp_path / "conv.csv"
    alt = tmp_path / "alt.csv"
    labels = tmp_path / "labels.csv"
    assert main(["gen", "-r", "30", "-c", "6", "-f", str(conv), "-a", str(alt), "-l", str(labels), "--seed", "7"]) == 0
    conv_rows = list(csv.reader(conv.open()))
    alt_rows = list(csv.reader(alt.open()))
    label_row = next(csv.reader(labels.open()))
    assert len(conv_rows) == 30 and len(conv_rows[0]) == 6
    # alternate = transpose minus label row (functions.scala:64-74)
    assert len(alt_rows) == 5 and len(alt_rows[0]) == 30
    assert [r[0] for r in conv_rows] == label_row
    assert [r[1] for r in conv_rows] == alt_rows[0]


def test_gen_seed_determinism(tmp_path):
    a, b = tmp_path / "a.csv", tmp_path / "b.csv"
    main(["gen", "-r", "10", "-c", "4", "-f", str(a), "--seed", "5"])
    main(["gen", "-r", "10", "-c", "4", "-f", str(b), "--seed", "5"])
    assert a.read_text() == b.read_text()


def test_flag_validation(tmp_path):
    with pytest.raises(SystemExit):
        main(["gen", "-r", "10", "-c", "4"])  # no output file
    with pytest.raises(SystemExit):
        main(["gen", "-r", "10", "-c", "4", "-a", str(tmp_path / "x.csv")])  # alt without labels
    with pytest.raises(SystemExit):
        main(["select", "-f", "x.csv", "-n", "0"])  # num-features must be > 0


def test_select_round_trip_identity(tmp_path, spark, capsys):
    conv = tmp_path / "conv.csv"
    alt = tmp_path / "alt.csv"
    labels = tmp_path / "labels.csv"
    main(["gen", "-r", "80", "-c", "7", "-f", str(conv), "-a", str(alt), "-l", str(labels), "--seed", "13"])
    rc = main(["select", "-f", str(conv), "-a", str(alt), "-l", str(labels), "-n", "3", "-v"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "SELECTED FEATURES ARE IDENTICAL" in out
