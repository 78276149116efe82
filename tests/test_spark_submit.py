"""Deployment-shape gate: the north rule's actual invocation —
`spark-submit --py-files kg.zip scripts/run_pipeline.py` — must work
with the package imported FROM THE ZIP (no repo on PYTHONPATH), the
way a multi-executor cluster receives the code.  Runs the resumable
pages pipeline and the export front door through it."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.fixture(scope="module")
def deploy(tmp_path_factory):
    """kg.zip + run_pipeline.py staged OUTSIDE the repo."""
    base = tmp_path_factory.mktemp("deploy")
    pkg = "project_discord_knowledge_graph_spark"
    zpath = base / "kg.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _dirs, files in os.walk(os.path.join(REPO, pkg)):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    shutil.copy(os.path.join(REPO, "scripts", "run_pipeline.py"), base)
    return base


def _submit(deploy, *args):
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only source
    proc = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]",
         "--py-files", str(deploy / "kg.zip"),
         str(deploy / "run_pipeline.py"), *args],
        cwd=str(deploy), env=env, capture_output=True, text=True,
        timeout=360)
    assert proc.returncode == 0, proc.stderr[-2000:]
    return [json.loads(line) for line in proc.stdout.splitlines()
            if line.startswith("{")]

@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT),
                    reason="spark-submit not on this host")
def test_spark_submit_pages_pipeline(deploy):
    out = _submit(deploy, "--synth", "1500",
                  "--pages", str(deploy / "pages"),
                  "--out", str(deploy / "out"),
                  "--lineage", str(deploy / "lin"),
                  "--buckets", "4", "--link-entities")
    summary, graph = out[0], out[1]
    assert summary["pending_buckets"] == 0
    assert summary["triples_out"] > 1000
    assert graph["edges"] == summary["triples_out"]
    assert graph["nodes"] > 10


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT),
                    reason="spark-submit not on this host")
def test_spark_submit_export_front_door(deploy):
    doc = {"channel": {"id": "c", "name": "alerts"}, "messages": [
        {"id": f"m{i}", "timestamp": f"2024-01-02T03:{i:02d}:00Z",
         "content": "alert: fomc meeting starts in 1 hour",
         "author": {"id": f"a{i % 5}", "name": f"user{i % 5}"}}
        for i in range(40)]}
    (deploy / "export.json").write_text(json.dumps(doc))
    out = _submit(deploy, "--export-json", str(deploy / "export.json"),
                  "--out", str(deploy / "out_export"))
    assert out[0]["triples_out"] == 5  # 5 authors x 1 deduped alert
