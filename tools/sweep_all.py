"""Un-fakeable full-query sweep (VERDICT r5 next #2).

Round 5's recorded "zero failures" sweep went stale the day it was
committed: the sweep session had imported a pre-edit ``__spark_entry__``
and kept vouching for queries a later commit had broken. This wrapper
makes that impossible by construction:

- it re-executes ``tools/check_entry.py`` in a FRESH interpreter (so
  the module state is exactly what's on disk right now);
- it records the git SHA of HEAD *and* whether the tree is dirty in the
  artifact header, so a sweep can always be matched against a commit;
- it fails loudly (non-zero exit, FAILURES echoed) on any red row.

Usage::

    python tools/sweep_all.py [sf_dir] [artifact_path]

Default artifact: ``docs/SWEEP_<shortsha><-dirty?>.txt``.
"""

from __future__ import annotations

import datetime
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=REPO, capture_output=True, text=True, check=True
    ).stdout.strip()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    sha = git("rev-parse", "HEAD")
    dirty = bool(git("status", "--porcelain", "--untracked-files=no"))
    artifact = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(
            REPO, "docs", f"SWEEP_{sha[:10]}{'-dirty' if dirty else ''}.txt"
        )
    )
    started = datetime.datetime.now(datetime.timezone.utc).isoformat()
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "check_entry.py"), sf_dir],
        cwd=REPO, capture_output=True, text=True,
    )
    out = proc.stdout
    header = (
        f"# full entry-query sweep\n"
        f"# git_sha: {sha}\n"
        f"# tree_dirty: {dirty}\n"
        f"# sf_dir: {sf_dir}\n"
        f"# started_utc: {started}\n"
        f"# finished_utc: "
        f"{datetime.datetime.now(datetime.timezone.utc).isoformat()}\n"
        f"# exit_code: {proc.returncode}\n"
    )
    os.makedirs(os.path.dirname(artifact), exist_ok=True)
    with open(artifact, "w") as fh:
        fh.write(header + out)
        if proc.returncode != 0:
            fh.write("\n# STDERR TAIL\n" + proc.stderr[-4000:])
    print(header, end="")
    # echo red rows + summary line so a caller's log shows the verdict
    for line in out.splitlines():
        if ("MISMATCH" in line or "ERROR" in line or line.startswith("FAILURES")
                or "WARNING" in line):
            print(line)
    print(f"artifact: {artifact}")
    return proc.returncode


if __name__ == "__main__":
    sys.exit(main())
