"""Fault isolation under concurrent window submission: one window's
unreadable file must be attributed to that window's ledger while every
other window lands normally — the probe and retry run inside the
failing window's thread and never poison its siblings."""

from __future__ import annotations

import gzip
import json
from datetime import datetime, timezone

from etly_spark.config import Duration, Resource, Source, Target, Transfer
from etly_spark.meta import Meta
from etly_spark.pipeline import DONE, NOOP, TransferService

import tests.test_fault_isolation  # noqa: F401 — registers test.FaultLog


def test_one_bad_window_does_not_poison_siblings(spark, tmp_path):
    days = ("20240108", "20240109", "20240110")
    for day in days:
        d = tmp_path / "in" / day
        d.mkdir(parents=True)
        (d / "good.log.gz").write_bytes(
            gzip.compress(f'{{"Id":{int(day[-2:])},"Name":"n{day}"}}\n'.encode())
        )
    # middle window also has a truncated gzip
    whole = gzip.compress(('{"Id":9,"Name":"x"}\n' * 200).encode())
    (tmp_path / "in" / "20240109" / "bad.log.gz").write_bytes(whole[: len(whole) // 2])
    (tmp_path / "out").mkdir()

    t = Transfer(
        name="pfault",
        source=Source(
            name=str(tmp_path / "in" / "<dateFormat:yyyyMMdd>"),
            data_type="test.FaultLog",
        ),
        target=Target(
            name=str(tmp_path / "out" / "<dateFormat:yyyyMMdd>" / "<file>"),
            compression="gzip",
        ),
        meta=Resource(name=str(tmp_path / "out" / "meta-<dateFormat:yyyyMMdd>.json")),
        time_window=Duration(duration=3, unit="day"),
        base_dir=str(tmp_path),
    )
    now = datetime(2024, 1, 10, 12, 0, 0, tzinfo=timezone.utc)
    result = TransferService(spark).run(t, now)
    assert result.status == DONE, result.error

    # every window's healthy file landed — including the faulted window's
    for day in days:
        out = tmp_path / "out" / day / "good.log.gz"
        assert out.exists(), f"healthy output missing for {day}"
        rec = json.loads(gzip.decompress(out.read_bytes()).decode().splitlines()[0])
        assert rec["Id"] == int(day[-2:])

    # the bad file is ledgered as an error in ITS window's meta only
    m_bad = Meta.load(str(tmp_path / "out" / "meta-20240109.json"))
    bad_entries = [v for v in m_bad.processed.values() if v.error]
    assert len(bad_entries) == 1 and "bad.log.gz" in bad_entries[0].source
    for day in ("20240108", "20240110"):
        m = Meta.load(str(tmp_path / "out" / f"meta-{day}.json"))
        assert not [v for v in m.processed.values() if v.error]
        assert len(m.processed) == 1

    # all three windows (incl. the bad file's skip entry) NOOP on re-run
    r2 = TransferService(spark).run(t, now)
    assert r2.status == NOOP, (r2.status, r2.error)
