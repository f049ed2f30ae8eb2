"""Deployment packaging: the --py-files zip must be self-contained — package
data (rule-packs) included and loadable via zipimport, which is how every
executor sees the code in a spark-submit deployment."""

from __future__ import annotations

import os
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_pyfiles_zip_is_self_contained(tmp_path):
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "package_pyfiles.py")],
        capture_output=True,
        text=True,
        check=True,
        cwd=REPO,
    )
    zip_path = out.stdout.strip().splitlines()[-1]
    names = set(zipfile.ZipFile(zip_path).namelist())
    assert "openfactverification_spark/rulepacks/default.json" in names
    assert "openfactverification_spark/rulepacks/__init__.py" in names

    # import the package FROM THE ZIP in a clean interpreter (zipimport, the
    # executor's view) and load the default pack through importlib.resources
    probe = (
        "import sys; sys.path.insert(0, sys.argv[1]); "
        "from openfactverification_spark.rulepack import DEFAULT_PACK; "
        "print(DEFAULT_PACK.identity)"
    )
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    res = subprocess.run(
        [sys.executable, "-c", probe, zip_path],
        capture_output=True,
        text=True,
        timeout=120,
        cwd=str(tmp_path),  # not the repo: the zip must be the only source
        env=env,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert res.stdout.strip() == "default@2"
