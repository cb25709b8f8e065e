"""End-to-end `spark-submit --py-files` packaging test (north_rule: the
job "runs via spark-submit --py-files on multi-executor clusters";
SURVEY.md §7.2 item 8).

Proves the library actually ships as a zip: the entrypoint scripts are
copied into a scratch directory and executed with cwd OUTSIDE the repo
checkout, so `import search_engine_spark` can only resolve from the
`--py-files` archive spark-submit puts on the driver/executor sys.path.

Build (scripts/build_index.py --synth) then serve
(scripts/query_index.py --queries) the reference query set over the
built segments, checking the summary JSON, per-bucket lineage/metrics
tables, and the ranked output contract (rank 1..k per query, scores
non-increasing, reference tie-break).

Skipped when no spark-submit is on PATH/SPARK_HOME (the library itself
never needs one — only this packaging test does).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def _find_spark_submit() -> str | None:
    cand = shutil.which("spark-submit")
    if cand:
        return cand
    for root in (os.environ.get("SPARK_HOME"), "/opt/spark"):
        if root and (Path(root) / "bin" / "spark-submit").exists():
            return str(Path(root) / "bin" / "spark-submit")
    return None


SPARK_SUBMIT = _find_spark_submit()

pytestmark = pytest.mark.skipif(
    SPARK_SUBMIT is None, reason="no spark-submit on this host"
)


def _make_pyfiles_zip(dst: Path) -> Path:
    """Zip the library exactly as the documented packaging command does
    (`zip -r search_engine_spark.zip search_engine_spark`)."""
    zpath = dst / "search_engine_spark.zip"
    src = REPO / "search_engine_spark"
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as zf:
        for p in sorted(src.rglob("*.py")):
            zf.write(p, p.relative_to(REPO))
    return zpath


def _submit(script: Path, *args: str, cwd: Path, pyfiles: Path) -> str:
    env = dict(os.environ)
    # The bundled deps (numpy/pandas/pyarrow) live in THIS interpreter.
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    env.pop("PYTHONPATH", None)  # nothing but the zip may provide the lib
    cmd = [
        SPARK_SUBMIT,
        "--master", "local[4]",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.sql.shuffle.partitions=8",
        "--conf", "spark.sql.adaptive.enabled=true",
        "--py-files", str(pyfiles),
        str(script), *args,
    ]
    proc = subprocess.run(
        cmd, cwd=cwd, env=env, capture_output=True, text=True, timeout=420,
    )
    assert proc.returncode == 0, (
        f"spark-submit failed ({proc.returncode}):\n"
        f"STDOUT:\n{proc.stdout[-4000:]}\nSTDERR:\n{proc.stderr[-4000:]}"
    )
    return proc.stdout


def test_spark_submit_build_then_query(tmp_path):
    pyfiles = _make_pyfiles_zip(tmp_path)
    # cwd holds ONLY the entrypoint scripts — no package dir in sight.
    for name in ("build_index.py", "query_index.py"):
        shutil.copy(REPO / "scripts" / name, tmp_path / name)
    idx = tmp_path / "idx"

    out = _submit(
        tmp_path / "build_index.py",
        "--synth", "400", "--out", str(idx), "--buckets", "4",
        "--run-id", "submit-e2e",
        cwd=tmp_path, pyfiles=pyfiles,
    )
    summary = json.loads(out.strip().splitlines()[-1])
    assert summary["n_docs"] == 400
    assert summary["built_buckets"] == 4
    assert summary["complete"]
    # Per-partition lineage + metrics landed next to the segments
    # (north_rule: "per-partition lineage + metrics").
    assert (idx / "lineage.parquet").exists()
    assert (idx / "metrics.parquet").exists()

    # Head-of-Zipf synthetic vocabulary terms: present in virtually every
    # page, so both queries are guaranteed non-empty at 400 docs (the
    # English reference queries only hit the ~1% injected pages).
    queries = tmp_path / "queries.txt"
    queries.write_text("w0 w1 w2\nw3 w4\n", encoding="utf-8")
    out = _submit(
        tmp_path / "query_index.py",
        "--index", str(idx), "--queries", str(queries), "--k", "5",
        cwd=tmp_path, pyfiles=pyfiles,
    )
    rows = [
        json.loads(ln) for ln in out.splitlines()
        if ln.startswith("{") and '"query_id"' in ln
    ]
    assert rows, f"no result rows in stdout:\n{out[-2000:]}"
    by_q: dict[str, list[dict]] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {"q0001", "q0002"}
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= 5
        # score DESC, url ASC tie-break (SURVEY §7.3 contract)
        keyed = [(-r["score"], r["url"]) for r in rs]
        assert keyed == sorted(keyed)
