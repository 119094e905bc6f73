"""Capstone DAG smoke (tools/capstone_crawl.py): the integrated
crawl→shards chain runs end-to-end at sf0.01 and its metering JSON is
well-formed — pins the example the STRESS throughput row is built on."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_capstone_chain_end_to_end(tmp_path):
    env = dict(os.environ, CAPSTONE_SRC="/root/testdata/sf0.01")
    proc = subprocess.run(
        [sys.executable, "tools/capstone_crawl.py", "6", str(tmp_path / "work")],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    m = json.loads(proc.stdout.strip().splitlines()[-1])
    assert m["docs_in"] == 500
    # dedup + gates + decontam keep a substantial, strictly-filtered set
    assert 0 < m["docs_clean"] <= m["docs_curated"] <= m["docs_in"]
    assert m["sequences"] > 0 and m["tokens_packed"] >= m["sequences"] * 1
    # every full sequence is exactly SEQ_LEN; only tails are short
    assert m["tokens_packed"] <= m["sequences"] * 512
    for stage in ("synth", "wet_extract", "curate", "classify", "decontam", "pack"):
        assert m["stage_s"][stage] > 0
