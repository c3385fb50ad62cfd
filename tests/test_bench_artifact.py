"""bench.py artifact-write protocol: curated ``*_note`` keys survive a
fresh capture's overwrite (VERDICT r17 #5 — the driver's bench run
dropped the r17 capture note; the preserve-notes fix from
tools/scale100.py is ported to bench._write_artifact)."""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import _write_artifact


def test_curated_notes_survive_overwrite(tmp_path):
    target = tmp_path / "bench_out.json"
    target.write_text(json.dumps({
        "value": 1.0,
        "r17_capture_note": "three takes under load bursts",
        "queries": {"old": 1.0},
    }))
    _write_artifact({"value": 2.0, "queries": {"new": 2.0}}, target)
    out = json.loads(target.read_text())
    assert out["value"] == 2.0
    assert out["queries"] == {"new": 2.0}
    assert out["r17_capture_note"] == "three takes under load bursts"


def test_fresh_note_wins_over_prior(tmp_path):
    target = tmp_path / "bench_out.json"
    target.write_text(json.dumps({"x_note": "old"}))
    _write_artifact({"x_note": "new", "value": 1.0}, target)
    assert json.loads(target.read_text())["x_note"] == "new"


def test_corrupt_prior_is_ignored(tmp_path):
    target = tmp_path / "bench_out.json"
    target.write_text("{not json")
    _write_artifact({"value": 3.0}, target)
    assert json.loads(target.read_text()) == {"value": 3.0}
