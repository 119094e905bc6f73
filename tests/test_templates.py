"""Template layer goldens from the reference test suite (util_test.go)."""

from datetime import datetime, timezone

from etly_spark.templates import (
    expand_date,
    expand_env,
    expand_file,
    expand_mod,
    expand_target_key,
    expand_vars,
    fnv64,
    java_date_format_to_strftime,
)


def test_date_expansion_golden():
    # util_test.go:11-14: unix 1497277950 → "!!20170612!! "
    ts = datetime.fromtimestamp(1497277950, tz=timezone.utc)
    assert expand_date("!!<dateFormat:yyyyMMdd>!! ", ts) == "!!20170612!! "


def test_mod_hash_golden():
    # util_test.go:17-20: FNV-1 64 of the filename, %40 → bucket 18
    name = "adlog.perf.log.2017-06-12_02-00.0.i-01972b29fe0657d40.gz"
    assert fnv64(name) % 40 == 18
    out = expand_mod(
        "gs://b/20170612/<mod:40>/02-adlog.perf.log.gz", fnv64(name)
    )
    assert out == "gs://b/20170612/18/02-adlog.perf.log.gz"


def test_env_expansion(monkeypatch):
    monkeypatch.setenv("USER", "etly")
    assert expand_env("s3://x/##env.USER##/y") == "s3://x/etly/y"
    assert expand_env("s3://x/${env.USER}/y") == "s3://x/etly/y"


def test_file_expansion():
    assert expand_file("out/<mod:2>_<file>", "file:///in/app.log") == "out/<mod:2>_app.log"


def test_var_expansion_longest_first():
    assert (
        expand_vars("a-$batch-$batchCount.log", {"$batch": "B", "$batchCount": "7"})
        == "a-B-7.log"
    )


def test_java_format_mapping():
    assert java_date_format_to_strftime("yyyy/MM/dd HH:mm:ss") == "%Y/%m/%d %H:%M:%S"


def test_full_target_key():
    ts = datetime.fromtimestamp(1497277950, tz=timezone.utc)
    key = expand_target_key(
        "file:///out/<dateFormat:yyyyMMdd>/<mod:2>_<file>",
        "file:///in/file1.log",
        ts,
    )
    bucket = fnv64("file1.log") % 2
    assert key == f"file:///out/20170612/{bucket}_file1.log"
