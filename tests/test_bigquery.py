"""BigQuery load-job semantics against a mock client — mirrors
pkg/bigquery/big_query_test.go use-cases (success, job-status errors
with per-file meta capture, cancel-on-timeout) plus the FailRetry wait
loop, without GCP."""

from __future__ import annotations

from etly_spark.io.bigquery import (
    BqError,
    BqJobStatus,
    BqWaitError,
    LoadJob,
    apply_load_status,
    generate_job_id,
    run_load_job,
)
from etly_spark.meta import Meta


class FakeClient:
    def __init__(self, statuses=None, wait_exc=None, wait_exc_count=0):
        self.statuses = statuses or [BqJobStatus()]
        self.wait_exc = wait_exc
        self.wait_exc_count = wait_exc_count
        self.cancelled = []
        self.runs = []
        self.waits = 0

    def run(self, job, job_id):
        self.runs.append(job_id)
        return job_id

    def wait(self, handle, timeout_sec):
        self.waits += 1
        if self.wait_exc and self.waits <= self.wait_exc_count:
            raise self.wait_exc
        return self.statuses[0]

    def cancel(self, handle):
        self.cancelled.append(handle)


def _job():
    return LoadJob(project_id="p", dataset_id="d", table_id="t", uris=["u1", "u2"], fail_retry=2)


def test_job_id_naming():
    # big_query.go:144-158 golden format
    assert (
        generate_job_id("ProjectID", "p", "DatasetID", "d", "TableID", "t", "Ts", "42")
        == "ProjectID--p__DatasetID--d__TableID--t__Ts--42__"
    )


def test_successful_load_records_all_objects(tmp_path):
    client = FakeClient()
    status, job_id, err = run_load_job(client, _job(), 30, now_unix=42)
    assert err == "" and status.state == "DONE"
    assert job_id.endswith("Ts--42__")

    meta = Meta(url=str(tmp_path / "meta.json"))
    msg = apply_load_status(meta, status, job_id, source_name="src", object_urls=["u1", "u2"])
    assert msg == ""
    assert meta.is_processed("u1") and meta.is_processed("u2")
    assert job_id in meta.processed["u1"].message


def test_load_errors_marked_skipped_next_run(tmp_path):
    # transfer_service.go:628-649: each error location is remembered so
    # the NEXT run skips the bad file instead of failing on it again
    status = BqJobStatus(
        state="DONE",
        errors=[BqError("u1", "bad json row"), BqError("", "global hiccup")],
    )
    meta = Meta(url=str(tmp_path / "meta.json"))
    msg = apply_load_status(meta, status, "job-1", source_name="src", object_urls=["u1", "u2"])
    assert "failed to perform GBQ load" in msg and "bad json row" in msg
    assert meta.is_processed("u1")          # bad file skipped next run
    assert meta.processed["u1"].error == "bad json row"
    assert not meta.is_processed("u2")      # good file NOT marked (reloads)
    assert meta.errors

    # round-trip: persisted error entry still skips
    meta.save()
    again = Meta.load(str(tmp_path / "meta.json"))
    assert again.is_processed("u1") and not again.is_processed("u2")


def test_timeout_cancels_job():
    client = FakeClient(wait_exc=TimeoutError(), wait_exc_count=99)
    status, job_id, err = run_load_job(client, _job(), 0.5, now_unix=1)
    assert status is None
    assert "timed out" in err and "cancelled" in err
    assert client.cancelled == [job_id]


def test_wait_retries_with_cubic_backoff():
    # big_query.go:127-139: transient status errors re-wait FailRetry
    # times with 3^(i+1)s backoff before giving up
    sleeps = []
    client = FakeClient(wait_exc=BqWaitError("flaky"), wait_exc_count=1)
    status, job_id, err = run_load_job(
        client, _job(), 30, now_unix=1, sleep=sleeps.append
    )
    assert err == "" and status is not None
    assert sleeps == [3.0]  # recovered on first retry

    sleeps2 = []
    client2 = FakeClient(wait_exc=BqWaitError("down"), wait_exc_count=99)
    status2, _, err2 = run_load_job(client2, _job(), 30, now_unix=1, sleep=sleeps2.append)
    assert status2 is None and "down" in err2
    assert sleeps2 == [3.0, 9.0]  # 3^1, 3^2 then give up
