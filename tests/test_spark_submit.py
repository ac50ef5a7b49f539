"""The north rule's deployment clause, exercised literally: run the
validation CLI via ``spark-submit --py-files neontology_spark.zip`` from
a directory containing ONLY the driver files (validate.py +
__spark_entry__.py) — the package must reach the driver and the executor
python workers exclusively through the zip, exactly as on a real
cluster. Asserts the exit-code contract (2 = violations found) and that
the audit store came out readable with the planted violations flagged."""

import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(
    shutil.which("spark-submit") is None, reason="spark-submit not on PATH"
)
def test_spark_submit_py_files_deployment(spark, tmp_path):
    from neontology_spark.images import generate_images

    table = str(tmp_path / "images.parquet")
    generate_images(spark, n_rows=2_000, n_parts=4).write.mode(
        "overwrite"
    ).parquet(table)

    # deployment dir: driver files + the package zip, nothing else
    dep = tmp_path / "deploy"
    dep.mkdir()
    pkg_zip = str(dep / "neontology_spark.zip")
    with zipfile.ZipFile(pkg_zip, "w") as z:
        for root, _, files in os.walk(os.path.join(REPO, "neontology_spark")):
            for f in files:
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    z.write(p, os.path.relpath(p, REPO))
    for f in ("validate.py", "__spark_entry__.py"):
        shutil.copy(os.path.join(REPO, f), dep / f)

    audit = str(tmp_path / "audit")
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    proc = subprocess.run(
        [
            shutil.which("spark-submit"),
            "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--py-files", pkg_zip,
            str(dep / "validate.py"),
            "--table", table,
            "--audit", audit,
            "--run-id", "submit_smoke",
            "--psnr-sample-rows", "8",
            "--master", "local[4]",
        ],
        cwd=str(dep),
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 2, (
        f"expected exit 2 (violations found), got {proc.returncode}\n"
        f"stdout:\n{proc.stdout[-3000:]}\nstderr:\n{proc.stderr[-3000:]}"
    )

    # the audit store a separate JVM wrote must be readable here, with
    # the planted violations present and verdicts on both sides
    from neontology_spark.audit import AuditStore

    store = AuditStore(spark, audit)
    verdicts = store.read("verdicts")
    vio = store.read("violations")
    assert verdicts is not None and vio is not None
    checks = {r["check"] for r in vio.select("check").distinct().collect()}
    assert "required_not_null" in checks and "unique__image_id" in checks
    passed = {r["passed"] for r in verdicts.select("passed").distinct().collect()}
    assert passed == {True, False}
