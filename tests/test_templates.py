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


def test_time_window_expansion_counts(spark):
    """transfer_service_test.go:9-40: 2 days → 2 expansions, 24 hours →
    24; no date template → deduped to 1."""
    from datetime import datetime

    from etly_spark.config import Duration, Source, Target, Transfer
    from etly_spark.pipeline import TransferService

    svc = TransferService(spark)
    now = datetime(2024, 1, 10, 12, 0, 0)

    t = Transfer(
        source=Source(name="file:///in/<dateFormat:yyyyMMdd>/"),
        target=Target(name="file:///out/<dateFormat:yyyyMMdd>/"),
        time_window=Duration(duration=2, unit="day"),
    )
    assert len(svc._time_window(t, now)) == 2

    t.time_window = Duration(duration=24, unit="hour")
    t.source.name = "file:///in/<dateFormat:yyyyMMddHH>/"
    assert len(svc._time_window(t, now)) == 24

    # without a date template every expansion is identical → dedup to 1
    t.source.name = "file:///in/static/"
    t.target.name = "file:///out/static/"
    assert len(svc._time_window(t, now)) == 1


def test_cli_run(spark, tmp_path, capsys):
    """`python -m etly_spark run` one-sweep semantics."""
    import json as _json

    from etly_spark import registry
    from etly_spark.__main__ import main

    if "cli.Log" not in registry.schemas:
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType, StringType, StructField, StructType

        registry.schemas.register(
            "cli.Log",
            StructType(
                [
                    StructField("Id", LongType()),
                    StructField("Name", StringType()),
                    StructField("Type", StringType()),
                ]
            ),
        )
        registry.transformers.register(
            "cli.LogToKV",
            lambda df: [
                F.col("Id").alias("Key"),
                F.concat_ws("/", F.col("Name"), F.col("Type")).alias("Value"),
            ],
        )

    src = tmp_path / "in"
    src.mkdir()
    (src / "f.log").write_text('{"Id":1,"Name":"n","Type":"t"}\n')
    (tmp_path / "out").mkdir()
    cfg = {
        "Transfers": [
            {
                "Name": "cli-smoke",
                "Source": {"Name": str(src), "Type": "url", "DataType": "cli.Log"},
                "Target": {"Name": str(tmp_path / "out" / "<file>")},
                "Meta": {"Name": str(tmp_path / "meta.json")},
                "Transformer": "cli.LogToKV",
            }
        ]
    }
    cfg_path = tmp_path / "transfers.json"
    cfg_path.write_text(_json.dumps(cfg))

    rc = main(["run", "--config", str(cfg_path)])
    out = _json.loads(capsys.readouterr().out)
    assert rc == 0
    assert out[0]["status"] == "DONE"
    assert out[0]["progress"]["record_processed"] == 1
    assert (tmp_path / "out" / "f.log").exists()
