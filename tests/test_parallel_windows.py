"""P3: independent time-windows submit their Spark DAGs concurrently
(reference: one goroutine per window group, transfer_service.go:451-477).
The barrier enricher PROVES concurrency: it only releases when two
window threads reach it together — sequential submission would block
20 s and fail the run."""

from __future__ import annotations

import json
import threading
from datetime import datetime, timezone

from etly_spark import registry
from etly_spark.config import Duration, Resource, Source, Target, Transfer
from etly_spark.meta import Meta
from etly_spark.pipeline import DONE, TransferService

import tests.test_pipeline_e2e  # noqa: F401 — registers test.Log1 types


def test_two_day_windows_run_concurrently(spark, tmp_path):
    for day in ("20240109", "20240110"):
        d = tmp_path / "in" / day
        d.mkdir(parents=True)
        (d / "a.log").write_text(
            f'{{"Id":{int(day[-2:])},"Name":"n{day}","Type":"a"}}\n'
        )
    (tmp_path / "out").mkdir()

    barrier = threading.Barrier(2)
    if "test.WindowBarrier" not in registry.enrichers:

        @registry.enrichers.register("test.WindowBarrier")
        def window_barrier(df, ctx):
            # plan-build time, once per window, in the window's thread:
            # releases only when BOTH windows are in flight together
            barrier.wait(timeout=20)
            return df

    t = Transfer(
        name="pwin",
        source=Source(
            name=str(tmp_path / "in" / "<dateFormat:yyyyMMdd>"),
            data_type="test.Log1",
        ),
        target=Target(name=str(tmp_path / "out" / "<dateFormat:yyyyMMdd>" / "<file>")),
        meta=Resource(name=str(tmp_path / "out" / "meta-<dateFormat:yyyyMMdd>.json")),
        transformer="test.Log1ToLog2",
        content_enricher="test.WindowBarrier",
        time_window=Duration(duration=2, unit="day"),
        base_dir=str(tmp_path),
    )
    now = datetime(2024, 1, 10, 12, 0, 0, tzinfo=timezone.utc)
    result = TransferService(spark).run(t, now)
    assert result.status == DONE, result.error

    # both windows landed, each under its own date dir + ledger
    for day, rec_id in (("20240109", 9), ("20240110", 10)):
        out = tmp_path / "out" / day / "a.log"
        assert out.exists(), f"missing window output {day}"
        assert json.loads(out.read_text().splitlines()[0])["Key"] == rec_id
        m = Meta.load(str(tmp_path / "out" / f"meta-{day}.json"))
        assert len(m.processed) == 1
    # merged progress saw both windows
    assert result.progress.file_processed == 2
    assert result.progress.record_processed == 2


def test_shared_meta_windows_stay_sequential(spark, tmp_path):
    """Windows that expand to the SAME meta URL form one group and must
    not run concurrently (ledger ownership): a 2-party barrier would
    deadlock, so the enricher must see them one at a time."""
    for day in ("20240109", "20240110"):
        d = tmp_path / "in" / day
        d.mkdir(parents=True)
        (d / "a.log").write_text('{"Id":1,"Name":"n","Type":"a"}\n')
    (tmp_path / "out").mkdir()

    active = {"n": 0, "max": 0}
    lock = threading.Lock()
    if "test.WindowOverlap" not in registry.enrichers:

        @registry.enrichers.register("test.WindowOverlap")
        def window_overlap(df, ctx):
            with lock:
                active["n"] += 1
                active["max"] = max(active["max"], active["n"])
            import time as _t

            _t.sleep(0.3)
            with lock:
                active["n"] -= 1
            return df

    t = Transfer(
        name="seqwin",
        source=Source(
            name=str(tmp_path / "in" / "<dateFormat:yyyyMMdd>"),
            data_type="test.Log1",
        ),
        target=Target(name=str(tmp_path / "out" / "<dateFormat:yyyyMMdd>" / "<file>")),
        meta=Resource(name=str(tmp_path / "out" / "meta-shared.json")),  # ONE ledger
        transformer="test.Log1ToLog2",
        content_enricher="test.WindowOverlap",
        time_window=Duration(duration=2, unit="day"),
        base_dir=str(tmp_path),
    )
    now = datetime(2024, 1, 10, 12, 0, 0, tzinfo=timezone.utc)
    result = TransferService(spark).run(t, now)
    assert result.status == DONE, result.error
    assert active["max"] == 1, "shared-ledger windows overlapped"
    m = Meta.load(str(tmp_path / "out" / "meta-shared.json"))
    assert len(m.processed) == 2
