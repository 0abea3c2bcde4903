"""Deploy-unit parity (VERDICT r15 items 3-4): the Dockerfile and CI
workflows mirror the reference's packaging (/root/reference/Dockerfile,
.github/workflows/{lint,etl-deploy}.yml) around the TESTED CLI surface.
No docker/network in the sandbox, so the contract checked here is the
one that matters: the image's entrypoint command line parses through
the same argparse surface the CLI tests drive, and the workflows only
reference files and commands that exist in the repo.
"""

from __future__ import annotations

import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _docker_json_array(dockerfile: str, directive: str) -> list[str]:
    m = re.search(rf"^{directive}\s+(\[.*\])\s*$", dockerfile, re.MULTILINE)
    assert m, f"Dockerfile has no exec-form {directive}"
    return json.loads(m.group(1))


def test_dockerfile_entrypoint_is_the_tested_cli_surface():
    with open(os.path.join(REPO, "Dockerfile")) as f:
        content = f.read()
    entry = _docker_json_array(content, "ENTRYPOINT")
    cmd = _docker_json_array(content, "CMD")
    assert entry == ["python", "-m", "etl_wlg_metlink_spark"]

    # the image's default invocation must parse through the real CLI
    # parser (unknown flags / missing required group would SystemExit)
    from etl_wlg_metlink_spark.__main__ import build_parser

    args = build_parser().parse_args(cmd)
    assert args.schedule == "/data/landing"
    assert args.checkpoint == "/data/checkpoint"
    # exactly-once contract: the default CMD pins a STABLE checkpoint,
    # never the temp-dir fallback
    assert args.checkpoint is not None

    # the documented override in the header is also valid CLI
    ov = ["--schedule", "/data/landing", "--checkpoint", "/data/checkpoint",
          "--config", "/etc/metlink/config.json"]
    args2 = build_parser().parse_args(ov)
    assert args2.config == "/etc/metlink/config.json"


def test_dockerfile_copies_the_package_it_runs():
    with open(os.path.join(REPO, "Dockerfile")) as f:
        content = f.read()
    assert "COPY etl_wlg_metlink_spark/ etl_wlg_metlink_spark/" in content
    assert "pyspark==" in content  # pinned runtime, not floating
    assert "openjdk-17" in content  # the tested JVM major


def test_workflows_reference_existing_paths():
    for wf in ("lint.yml", "etl-deploy.yml"):
        path = os.path.join(REPO, ".github", "workflows", wf)
        assert os.path.isfile(path), f"missing workflow {wf}"
        with open(path) as f:
            content = f.read()
        # every repo path named in a run: line must exist
        for rel in re.findall(
            r"run: .*?(?:ruff check|compileall -q|pytest) ([^\n|&]*)", content
        ):
            for token in rel.split():
                if token.startswith("-"):
                    continue
                assert os.path.exists(os.path.join(REPO, token)), (
                    f"{wf} references missing path {token}"
                )
    # pyproject carries the ruff config the workflows run against
    with open(os.path.join(REPO, "pyproject.toml")) as f:
        assert "[tool.ruff" in f.read()
