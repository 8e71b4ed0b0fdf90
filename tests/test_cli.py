"""CLI surface: output contract parity with the reference command
(cli.py:93-126 — index/string/file projections, %.2f scores, span columns,
stderr percentage aggregates), and local == --spark execution."""

import subprocess
import sys

REPO = "/root/repo"


def _run(args):
    return subprocess.run([sys.executable, "-m", "nmalign_spark.cli", *args],
                          capture_output=True, text=True, cwd=REPO)


def test_indices_output_and_aggregates():
    r = _run(["--strings1", "erste Zeile", "zweite Zeile",
              "--strings2", "Erste Zeile!", "Zweyte Zeile"])
    assert r.returncode == 0
    lines = r.stdout.strip().splitlines()
    assert len(lines) == 2
    for ln in lines:
        parts = ln.split("\t")
        assert len(parts) == 3
        float(parts[2])                      # %.2f column parses
    assert "average alignment confidence:" in r.stderr
    assert "coverage of matching inputs1:" in r.stderr
    assert "coverage of matching inputs2:" in r.stderr


def test_show_strings_with_normalization():
    r = _run(["-s", "-N", '{"ſ": "s"}',
              "--strings1", "Waſ iſt", "--strings2", "Was ist"])
    assert r.returncode == 0
    assert r.stdout.splitlines()[0] == "Waſ iſt\tWas ist\t1.00"


def test_files_projection(tmp_path):
    f1 = tmp_path / "a.txt"
    f2 = tmp_path / "b.txt"
    f1.write_text("hello world")
    f2.write_text("hello world")
    r = _run(["-f", "--files1", str(f1), "--files2", str(f2)])
    assert r.returncode == 0
    assert r.stdout.splitlines()[0] == f"{f1}\t{f2}\t1.00"


def test_splits_emit_span_columns():
    r = _run(["-x", "--strings1", "aa bb cc", "dd ee ff",
              "--strings2", "aa bb cc dd ee ff", "zz"])
    assert r.returncode == 0
    for ln in r.stdout.strip().splitlines():
        parts = ln.split("\t")
        assert len(parts) in (3, 5)          # span rows get beg/end appended


def test_separator_option():
    r = _run(["-S", ";", "--strings1", "abc", "--strings2", "abc"])
    assert r.stdout.splitlines()[0] == "0;0;1.00"


def test_spark_mode_matches_local():
    args = ["-s", "-x", "-N", '{"0": "o"}',
            "--strings1", "first line here", "sec0nd line g0es here",
            "--strings2", "first line here", "second line goes here"]
    local = _run(args)
    spark = _run(args + ["--spark"])
    assert local.returncode == spark.returncode == 0
    assert local.stdout == spark.stdout


def test_option_range_validation():
    """Reference parity (scripts/cli.py:12-13): -c constrained to
    FloatRange(0,1), -j to IntRange(1,32) — out-of-range exits 2 with a
    usage error instead of silently producing an all-unmatched result."""
    base = ["--strings1", "a", "--strings2", "a"]
    r = _run(["-c", "1.5", *base])
    assert r.returncode == 2 and "cutoff" in r.stderr
    r = _run(["-c", "-0.1", *base])
    assert r.returncode == 2 and "cutoff" in r.stderr
    r = _run(["-j", "0", *base])
    assert r.returncode == 2 and "processes" in r.stderr
    r = _run(["-j", "33", *base])
    assert r.returncode == 2 and "processes" in r.stderr
    r = _run(["-c", "1.0", "-j", "32", *base])
    assert r.returncode == 0
