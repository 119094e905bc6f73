"""Scheduler + task registry + management HTTP API tests
(reference semantics: service_test.go:81-127, 174-216)."""

from __future__ import annotations

import json
import urllib.request

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from etly_spark import registry
from etly_spark.config import Duration, Resource, Source, Target, Transfer
from etly_spark.pipeline import DONE, NOOP
from etly_spark.server import Server
from etly_spark.service import Service

if "svc.Log" not in registry.schemas:
    registry.schemas.register(
        "svc.Log",
        StructType(
            [
                StructField("Id", LongType()),
                StructField("Name", StringType()),
                StructField("Type", StringType()),
            ]
        ),
    )

    @registry.transformers.register("svc.LogToKV")
    def log_to_kv(df):
        return [
            F.col("Id").alias("Key"),
            F.concat_ws("/", F.col("Name"), F.col("Type")).alias("Value"),
        ]


@pytest.fixture()
def workdir(tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    (src / "file1.log").write_text(
        '{"Id":1,"Name":"n1","Type":"a"}\n{"Id":2,"Name":"n2","Type":"b"}\n'
    )
    (tmp_path / "out").mkdir()
    return tmp_path


def _transfer(tmp_path, frequency=None) -> Transfer:
    return Transfer(
        name="svc-smoke",
        source=Source(name=str(tmp_path / "in"), data_type="svc.Log"),
        target=Target(name=str(tmp_path / "out" / "out-<file>")),
        meta=Resource(name=str(tmp_path / "meta.json")),
        transformer="svc.LogToKV",
        frequency=frequency,
        base_dir=str(tmp_path),
    )


def test_transfer_once_and_noop(spark, workdir):
    svc = Service(spark, [_transfer(workdir)])
    tasks = svc.transfer_once()
    assert [t.status for t in tasks] == [DONE]
    assert tasks[0].progress["record_processed"] == 2
    assert (workdir / "out" / "out-file1.log").exists()

    # idempotent: meta skip ⇒ NOOP (transfer_service.go:49-66 semantics)
    tasks2 = svc.transfer_once()
    assert [t.status for t in tasks2] == [NOOP]

    # registry: history holds both tasks, newest first
    all_tasks = svc.registry.tasks()
    assert [t.status for t in all_tasks] == [NOOP, DONE]
    assert svc.status()["status"] == "ok"


def test_scheduler_frequency_gate(spark, workdir):
    t = _transfer(workdir, frequency=Duration(duration=1, unit="hour"))
    svc = Service(spark, [t])
    ran1 = svc.run_due()
    assert len(ran1) == 1 and ran1[0].status == DONE
    # not due again for an hour
    assert svc.run_due() == []


def test_repeat_loop(spark, workdir):
    t = _transfer(workdir)
    t.repeat = 2
    svc = Service(spark, [t])
    tasks = svc.transfer_once()
    assert [x.status for x in tasks] == [DONE, NOOP, NOOP]


def test_http_api(spark, workdir):
    svc = Service(spark, [_transfer(workdir)])
    server = Server(svc, port=0)
    server.start(scheduler=False)
    base = f"http://127.0.0.1:{server.port}"

    def get(path):
        with urllib.request.urlopen(base + path, timeout=30) as r:
            return json.loads(r.read())

    def post(path, payload):
        req = urllib.request.Request(
            base + path, data=json.dumps(payload).encode(), method="POST"
        )
        with urllib.request.urlopen(req, timeout=300) as r:
            return json.loads(r.read())

    try:
        assert get("/etly/version")["version"]
        resp = post("/etly/transferOnce", {})
        assert resp["status"] == "ok"
        assert [t["status"] for t in resp["tasks"]] == [DONE]

        done = get("/etly/tasks?status=DONE")["tasks"]
        assert len(done) == 1 and done[0]["progress"]["record_processed"] == 2
        assert get("/etly/tasklist/?limit=1")["tasks"][0]["id"] == done[0]["id"]
        assert get(f"/etly/tasks/{done[0]['id']}")["tasks"][0]["name"] == "svc-smoke"
        assert get("/etly/errors")["tasks"] == []
        info = get("/etly/info/svc-smoke")
        assert info["meta"]["status"]["record_processed"] == 2
        assert get("/etly/status")["status"] == "ok"
    finally:
        server.stop()


def test_bq_schema_converter():
    from etly_spark.io.bigquery import bq_schema_to_struct, parse_bq_url

    assert parse_bq_url("bg://proj/ds.tbl") == ("proj", "ds", "tbl")
    with pytest.raises(ValueError):
        parse_bq_url("gs://bucket/x")

    st = bq_schema_to_struct(
        json.dumps(
            [
                {"name": "id", "type": "integer", "mode": "required"},
                {"name": "tags", "type": "string", "mode": "repeated"},
                {
                    "name": "nested",
                    "type": "record",
                    "fields": [{"name": "x", "type": "float"}],
                },
            ]
        )
    )
    assert st["id"].dataType.typeName() == "long" and not st["id"].nullable
    assert st["tags"].dataType.typeName() == "array"
    assert st["nested"].dataType["x"].dataType.typeName() == "double"


def test_fail_retry_backoff(spark, workdir, monkeypatch):
    t = _transfer(workdir)
    t.transformer = "svc.DoesNotExist"  # validate() fails ⇒ ERROR status
    t.fail_retry = 2
    monkeypatch.setattr(Service, "_backoff", staticmethod(lambda i: 0.0))
    svc = Service(spark, [t])

    calls = []
    orig = svc.engine.run

    def counting_run(transfer, now=None):
        calls.append(1)
        return orig(transfer, now)

    svc.engine.run = counting_run
    tasks = svc.transfer_once()
    assert tasks[0].status == "ERROR"
    assert len(calls) == 3  # initial + FailRetry=2 retries (E2)


def test_max_allowed_size_rolls_outputs(spark, tmp_path):
    """B1: outputs roll to numbered siblings past MaxAllowedSize."""
    src = tmp_path / "in"
    src.mkdir()
    (tmp_path / "out").mkdir()
    # two source files → two staged parts under the single target key
    (src / "a.log").write_text('{"Id":1,"Name":"n1","Type":"a"}\n')
    (src / "b.log").write_text('{"Id":2,"Name":"n2","Type":"b"}\n')
    from etly_spark.config import Resource, Source, Target, Transfer

    t = Transfer(
        name="roll",
        source=Source(name=str(src), data_type="svc.Log"),
        target=Target(name=str(tmp_path / "out" / "all.log"), max_allowed_size=10),
        meta=Resource(name=str(tmp_path / "out" / "meta.json")),
        transformer="svc.LogToKV",
        base_dir=str(tmp_path),
    )
    svc = Service(spark, [t])
    tasks = svc.transfer_once()
    assert tasks[0].status == DONE
    names = sorted(p.name for p in (tmp_path / "out").glob("all.log*"))
    assert names == ["all.log", "all.log.1"]
    keys = set()
    for n in names:
        for line in (tmp_path / "out" / n).read_text().splitlines():
            keys.add(json.loads(line)["Key"])
    assert keys == {1, 2}


def test_single_part_finalization_is_rename_only(spark, tmp_path, monkeypatch):
    """K1 scale contract: a key whose staged output is one part file is
    finalized by a metadata rename — zero bytes stream through the
    driver and no executor concat job is launched."""
    from etly_spark.config import Resource, Source, Target, Transfer
    from etly_spark.pipeline import TransferService

    src = tmp_path / "in"
    src.mkdir()
    (tmp_path / "out").mkdir()
    (src / "a.log").write_text('{"Id":1,"Name":"n1","Type":"a"}\n')

    concats = []
    monkeypatch.setattr(
        TransferService,
        "_run_byte_jobs",
        lambda self, jobs: concats.extend(jobs),
    )
    t = Transfer(
        name="rename-only",
        source=Source(name=str(src), data_type="svc.Log"),
        target=Target(name=str(tmp_path / "out" / "all.log")),
        meta=Resource(name=str(tmp_path / "out" / "meta.json")),
        transformer="svc.LogToKV",
        base_dir=str(tmp_path),
    )
    tasks = Service(spark, [t]).transfer_once()
    assert tasks[0].status == DONE
    assert (tmp_path / "out" / "all.log").exists()
    assert concats == [], "single-part key must not byte-copy"


def test_multi_part_finalization_concats_executor_side(spark, tmp_path, monkeypatch):
    """K1: a key staged as multiple parts is concatenated by an executor
    task (fsio.concat inside sc.parallelize), yielding one object with
    every record."""
    from etly_spark.config import Resource, Source, Target, Transfer
    from etly_spark.pipeline import TransferService

    jobs_seen = []
    orig = TransferService._run_byte_jobs
    monkeypatch.setattr(
        TransferService,
        "_run_byte_jobs",
        lambda self, jobs, **kw: (jobs_seen.extend(jobs), orig(self, jobs, **kw))[1],
    )

    src = tmp_path / "in"
    src.mkdir()
    (tmp_path / "out").mkdir()
    # two source files → two tasks → two staged parts under one key
    (src / "a.log").write_text('{"Id":1,"Name":"n1","Type":"a"}\n')
    (src / "b.log").write_text('{"Id":2,"Name":"n2","Type":"b"}\n')
    t = Transfer(
        name="concat",
        source=Source(name=str(src), data_type="svc.Log"),
        target=Target(name=str(tmp_path / "out" / "all.log")),
        meta=Resource(name=str(tmp_path / "out" / "meta.json")),
        transformer="svc.LogToKV",
        base_dir=str(tmp_path),
    )
    tasks = Service(spark, [t]).transfer_once()
    assert tasks[0].status == DONE
    out = tmp_path / "out" / "all.log"
    assert out.exists() and not (tmp_path / "out" / "all.log.1").exists()
    keys = {json.loads(l)["Key"] for l in out.read_text().splitlines()}
    assert keys == {1, 2}
    assert len(jobs_seen) == 1 and len(jobs_seen[0][0]) == 2, jobs_seen


def test_remote_scheme_sink_finalizes_executor_side(spark, tmp_path, monkeypatch):
    """K1 to an object store: with a non-local target scheme every roll —
    even single-part — is an executor byte job (an upload; there is no
    driver-side rename to a remote store), routed through the fsio
    non-local branches. ``mock://`` is the remote-dressed local store, so
    this exercises the exact code path an ``s3a://``/``gs://`` target
    takes, minus the client library."""
    import json as _json

    from etly_spark.config import Resource, Source, Target, Transfer
    from etly_spark.io import fs as fsio
    from etly_spark.pipeline import TransferService

    src = tmp_path / "in"
    src.mkdir()
    store = tmp_path / "store"
    store.mkdir()
    (src / "a.log").write_text('{"Id":1,"Name":"n1","Type":"a"}\n{"Id":3,"Name":"n3","Type":"a"}\n')
    (src / "b.log").write_text('{"Id":2,"Name":"n2","Type":"b"}\n')

    jobs_seen = []
    orig = TransferService._run_byte_jobs
    monkeypatch.setattr(
        TransferService,
        "_run_byte_jobs",
        lambda self, jobs, **kw: (jobs_seen.extend(jobs), orig(self, jobs, **kw))[1],
    )
    t = Transfer(
        name="remote-sink",
        source=Source(name=str(src), data_type="svc.Log"),
        target=Target(name=f"mock://{store}/bucket-<mod:2>.log"),
        meta=Resource(name=str(tmp_path / "meta.json")),
        transformer="svc.LogToKV",
        base_dir=str(tmp_path),
    )
    tasks = Service(spark, [t]).transfer_once()
    assert tasks[0].status == DONE

    outputs = sorted(p.name for p in store.iterdir())
    assert outputs and all(n.startswith("bucket-") for n in outputs)
    keys = set()
    for n in outputs:
        for line in (store / n).read_text().splitlines():
            keys.add(_json.loads(line)["Key"])
    assert keys == {1, 2, 3}
    # every output object was produced by an executor byte job with a
    # mock:// destination — nothing was finalized via local rename
    assert len(jobs_seen) == len(outputs)
    assert all(dst.startswith("mock://") for _, dst in jobs_seen)
    # fsio primitives agree through the remote branch
    assert fsio.exists(f"mock://{store}/{outputs[0]}")
    listed = {name for name, _, is_dir in fsio.listdir(f"mock://{store}") if not is_dir}
    assert listed == set(outputs)


def test_scheduler_ticker_loop(spark, workdir):
    """C1: the background 1s ticker fires due transfers repeatedly
    (service.go:48-98); first run DONE, repeats NOOP via meta skip."""
    import time as _time

    t = _transfer(workdir, frequency=Duration(duration=1, unit="sec"))
    svc = Service(spark, [t])
    svc.start(tick_sec=0.2)
    try:
        deadline = _time.time() + 60
        while _time.time() < deadline:
            statuses = [x.status for x in svc.registry.tasks()]
            if DONE in statuses and NOOP in statuses:
                break
            _time.sleep(0.5)
        statuses = [x.status for x in svc.registry.tasks()]
        assert DONE in statuses and NOOP in statuses, statuses
    finally:
        svc.stop()


def test_transfer_timeout_enforced(spark, workdir, monkeypatch):
    """P3/TimeOut (util.go:253-262, transfer_service.go:472-477): a hung
    transfer is bounded by Transfer.TimeOut — the task surfaces ERROR
    with a timeout message instead of wedging the scheduler slot."""
    import time as _time

    t = _transfer(workdir)
    t.time_out = Duration(duration=1, unit="sec")
    t.fail_retry = 0  # don't retry the deliberate hang
    svc = Service(spark, [t])

    def hang(transfer, now=None):
        _time.sleep(10)
        raise AssertionError("unreachable in the bounded path")

    svc.engine.run = hang
    t0 = _time.monotonic()
    tasks = svc.transfer_once()
    elapsed = _time.monotonic() - t0
    assert tasks[0].status == "ERROR"
    assert "timed out" in tasks[0].error
    assert elapsed < 5, f"timeout not enforced, took {elapsed:.1f}s"


def test_no_timeout_runs_inline(spark, workdir):
    """Without TimeOut the transfer runs on the scheduler thread and
    completes normally (the smoke config has no timeout)."""
    t = _transfer(workdir)
    assert t.time_out is None
    svc = Service(spark, [t])
    tasks = svc.transfer_once()
    assert tasks[0].status == DONE


def test_http_transfer_worker_endpoint(spark, workdir):
    """POST /etly/transfer (server.go:91-96 + transfer_object_service.go:
    15-33): one object through the full chain, counts in the response,
    no meta ledger write — the worker-RPC surface superset."""
    svc = Service(spark, [])
    server = Server(svc, port=0)
    server.start(scheduler=False)
    base = f"http://127.0.0.1:{server.port}"
    try:
        spec = {
            "Name": "one-object",
            "Source": {"Name": str(workdir / "in"), "DataType": "svc.Log"},
            "Target": {"Name": str(workdir / "out" / "obj-<file>")},
            "Transformer": "svc.LogToKV",
        }
        payload = {
            "TaskID": "t-1",
            "SourceURL": str(workdir / "in" / "file1.log"),
            "Transfer": spec,
        }
        req = urllib.request.Request(
            base + "/etly/transfer", data=json.dumps(payload).encode(), method="POST"
        )
        with urllib.request.urlopen(req, timeout=300) as r:
            resp = json.loads(r.read())
        assert resp["RecordProcessed"] == 2 and resp["Error"] == ""
        assert resp["ProcessedTransfers"][0]["RecordErrors"] == 0
        out = (workdir / "out" / "obj-file1.log").read_text().strip().splitlines()
        assert len(out) == 2
        # worker writes no ledger (the master owns it)
        assert not (workdir / "meta.json").exists()
    finally:
        server.stop()


def test_http_rollup_endpoint(spark, workdir):
    from etly_spark.config import Rollup

    t = _transfer(workdir)
    t.rollup = Rollup(
        state_dir=str(workdir / "rollup"),
        keys=["Key"],
        aggregates={"n": "count"},
    )
    svc = Service(spark, [t])
    server = Server(svc, port=0)
    server.start(scheduler=False)
    base = f"http://127.0.0.1:{server.port}"
    try:
        # before any run: empty rows, not an error
        with urllib.request.urlopen(base + "/etly/rollup/svc-smoke", timeout=30) as r:
            empty = json.loads(r.read())
        assert empty["rollup"]["rows"] == []
        svc.transfer_once()
        with urllib.request.urlopen(base + "/etly/rollup/svc-smoke", timeout=60) as r:
            got = json.loads(r.read())
        rows = {row["Key"]: row["n"] for row in got["rollup"]["rows"]}
        assert sum(rows.values()) == 2 and all(n == 1 for n in rows.values())
    finally:
        server.stop()
