"""Cross-topology determinism smoke (the pytest twin of
tools/topology_parity.py, which runs ALL 47 gate queries — this keeps a
compact subset under CI so a closure that stops pickling, a zip-packaging
regression, or an order-dependent aggregation fails in tests, not only
in the per-round tool run).

Launches a REAL spark:// master + 2 worker JVMs, runs three
representative queries (a window chain, a dedup aggregate, a Python-free
Catalyst query) at sf0.001 on the cluster, and compares row-order-free
value fingerprints against a local session.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = "/root/testdata/sf0.001"
QUERIES = ["sessionize", "dedup_exact", "lang_id"]


def _port_free(port: int) -> bool:
    with socket.socket() as s:
        try:
            s.bind(("127.0.0.1", port))
            return True
        except OSError:
            return False


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="no sf0.001 testdata")
def test_gate_queries_hash_identical_on_standalone_cluster(spark, tmp_path):
    from tools.standalone_cluster import MASTER_PORT, launch_cluster
    from tools.topology_parity import frame_fingerprint

    if not _port_free(MASTER_PORT):
        pytest.skip(f"standalone master port {MASTER_PORT} busy")

    import __spark_entry__ as em
    from nuclei_feature_extraction_spark.session import get_spark

    qs = em.queries()
    local_fp = {n: frame_fingerprint(qs[n](spark, SF_DIR)) for n in QUERIES}

    # the session fixture is local[4]; a second in-process session can't
    # coexist — run the cluster side in a child interpreter using the
    # SAME topology recipe as the bench/parity tool (connect_standalone)
    script = f"""
import json, sys
sys.path.insert(0, {REPO!r})
import __spark_entry__ as em
from tools.topology_parity import frame_fingerprint
from tools.standalone_cluster import connect_standalone
spark = connect_standalone("nfx-parity-pytest", ship_entry=True)
qs = em.queries()
out = {{n: frame_fingerprint(qs[n](spark, {SF_DIR!r})) for n in {QUERIES!r}}}
spark.stop()
print("FP_JSON:" + json.dumps(out))
"""
    from tools.standalone_cluster import stop_cluster

    procs = launch_cluster(str(tmp_path / "logs"))
    try:
        res = subprocess.run(
            [sys.executable, "-c", script], capture_output=True, text=True,
            timeout=600, cwd=REPO,
        )
    finally:
        stop_cluster(procs)
    assert res.returncode == 0, res.stderr[-3000:]
    import json

    line = [ln for ln in res.stdout.splitlines() if ln.startswith("FP_JSON:")]
    assert line, res.stdout[-2000:]
    sa_fp = json.loads(line[-1][len("FP_JSON:"):])
    for n in QUERIES:
        assert sa_fp[n]["hash"] == local_fp[n]["hash"], n
        assert sa_fp[n]["rows"] == local_fp[n]["rows"], n
        assert sa_fp[n]["schema"] == local_fp[n]["schema"], n
