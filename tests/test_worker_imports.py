"""Worker-side import robustness: pandas-UDF closures that reference
module-level helpers are cloudpickled BY NAME (module+attr), so the Python
worker must be able to ``import sqlserver_cdc_to_kafka_spark`` from its own
environment — which is NOT the driver's ``sys.path``, and in a cluster is a
different machine entirely.  ``get_spark`` exports the package root on
PYTHONPATH before the JVM launches (the local-mode analog of --py-files);
this test drives a real worker-executing query from a cwd OUTSIDE the repo
with PYTHONPATH scrubbed, which dies in ``read_udfs`` with
ModuleNotFoundError if that export is lost."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPT = """
import sys
sys.path.insert(0, {repo!r})
from sqlserver_cdc_to_kafka_spark.registry import load_all
from sqlserver_cdc_to_kafka_spark.session import get_spark
spark = get_spark("worker-import-test", cpus=4)
# a query whose pandas UDF closes over module-level codec helpers — the
# by-name cloudpickle case that only a worker-side import can satisfy
n = load_all()["multimodal_audio_features"].fn(spark, "/root/testdata/sf0.01").count()
assert n > 0, n
print("OK", n)
"""


def test_worker_executing_query_runs_from_outside_cwd(tmp_path):
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT.format(repo=REPO)],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "OK" in proc.stdout
