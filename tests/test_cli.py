"""run_corpus CLI: subprocess drive (owns its own Ray session)."""

import json
import subprocess
import sys


def test_run_corpus_extract(tiny_pages_dir, tmp_path):
    out = subprocess.run(
        [
            sys.executable, "scripts/run_corpus.py",
            "--input", tiny_pages_dir,
            "--out", str(tmp_path / "o"),
            "--num-cpus", "2",
            "--wave-shards", "2",
        ],
        capture_output=True, text=True, timeout=600, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    summary = json.loads(out.stdout.strip().splitlines()[-1])
    assert summary["rows"] == 200 and summary["shards"] == 4
    # resume converges: second invocation runs zero waves
    out2 = subprocess.run(
        [
            sys.executable, "scripts/run_corpus.py",
            "--input", tiny_pages_dir,
            "--out", str(tmp_path / "o"),
            "--num-cpus", "2",
        ],
        capture_output=True, text=True, timeout=600, cwd="/root/repo",
    )
    summary2 = json.loads(out2.stdout.strip().splitlines()[-1])
    assert summary2["waves"] == 0 and summary2["rows"] == 200


def test_run_corpus_compact(tiny_pages_dir, tmp_path):
    out = subprocess.run(
        [
            sys.executable, "scripts/run_corpus.py",
            "--input", tiny_pages_dir,
            "--out", str(tmp_path / "o"),
            "--num-cpus", "2",
            "--wave-shards", "2",
            "--compact",
        ],
        capture_output=True, text=True, timeout=600, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    summary = json.loads(out.stdout.strip().splitlines()[-1])
    c = summary["compaction"]
    assert c["compacted_shards"] >= 4
    assert 0 < c["files_after"] <= c["files_before"]
