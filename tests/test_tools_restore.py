"""tools/restore_checkpoint.sh — committed-asset restore layout contract.

Every session starts from a machine reset; trained checkpoints survive
only as assets/checkpoints/<id>-<step>.tar.gz (each containing just the
Orbax step directory).  The restore script must unpack one into
<logdir>/<id>/checkpoints/<step>/ — the layout eval.py/train.py
--load-checkpoint expects — including ids that themselves end in a
digit-bearing token (flagship-v3-cars-h192-40000 -> id ...-h192).
No reference counterpart (the reference keeps checkpoints on disk);
this pins the cold-machine workflow CLAUDE.md documents.
"""

import subprocess
import tarfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
SCRIPT = REPO / "tools" / "restore_checkpoint.sh"


def _make_asset(tmp_path: Path, base: str, step: str) -> Path:
    src = tmp_path / "src" / step
    src.mkdir(parents=True)
    (src / "_CHECKPOINT_METADATA").write_text("{}")
    tar = tmp_path / f"{base}-{step}.tar.gz"
    with tarfile.open(tar, "w:gz") as tf:
        tf.add(src, arcname=step)
    return tar


def test_restore_by_path_and_id_split(tmp_path):
    # id containing a digit-bearing token: only the trailing -<step>
    # may be stripped.
    tar = _make_asset(tmp_path, "exp-h192", "400")
    logdir = tmp_path / "logs"
    out = subprocess.run(
        ["sh", str(SCRIPT), str(tar), str(logdir)],
        capture_output=True, text=True, check=True,
    )
    dest = logdir / "exp-h192" / "checkpoints"
    assert out.stdout.strip() == str(dest)
    assert (dest / "400" / "_CHECKPOINT_METADATA").is_file()


def test_restore_idempotent(tmp_path):
    tar = _make_asset(tmp_path, "exp", "20")
    logdir = tmp_path / "logs"
    for _ in range(2):  # second run must not fail or duplicate
        subprocess.run(["sh", str(SCRIPT), str(tar), str(logdir)],
                       capture_output=True, text=True, check=True)
    assert (logdir / "exp" / "checkpoints" / "20" / "_CHECKPOINT_METADATA").is_file()


def test_restore_unknown_asset_fails(tmp_path):
    r = subprocess.run(["sh", str(SCRIPT), "no-such-asset-1", str(tmp_path)],
                       capture_output=True, text=True)
    assert r.returncode != 0
