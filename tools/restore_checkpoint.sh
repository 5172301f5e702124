#!/bin/sh
# Restore a committed checkpoint tarball into the /root/logs layout that
# train.py --load-checkpoint / eval.py --load-checkpoint expect.
#
# Every session starts from a full machine reset (only the git repo
# survives — CLAUDE.md); trained checkpoints are committed as
# assets/checkpoints/<experiment-id>-<step>.tar.gz, each containing just
# the Orbax step directory (<step>/...).  This script unpacks one into
#   <logdir>/<experiment-id>/checkpoints/<step>/
# so an eval or a training resume can point --load-checkpoint at
# <logdir>/<experiment-id>/checkpoints directly.
#
# Usage:
#   sh tools/restore_checkpoint.sh flagship-v3-chairs-20000 [LOGDIR]
#   sh tools/restore_checkpoint.sh assets/checkpoints/flagship-v5-cars-80000.tar.gz
# Default LOGDIR: /root/logs.  Prints the --load-checkpoint path on success.
set -e
cd "$(dirname "$0")/.."

NAME=${1:?"usage: restore_checkpoint.sh <asset-name-or-path> [logdir]"}
LOGDIR=${2:-/root/logs}

case "$NAME" in
  *.tar.gz) TAR=$NAME ;;
  *)        TAR=assets/checkpoints/$NAME.tar.gz ;;
esac
[ -f "$TAR" ] || { echo "no such asset: $TAR" >&2; ls assets/checkpoints >&2; exit 2; }

# experiment id = basename minus the trailing -<step> (steps are numeric;
# ids may themselves contain hyphens, e.g. flagship-v3-cars-h192-40000).
BASE=$(basename "$TAR" .tar.gz)
STEP=$(echo "$BASE" | sed 's/.*-\([0-9][0-9]*\)$/\1/')
ID=$(echo "$BASE" | sed 's/-[0-9][0-9]*$//')

DEST=$LOGDIR/$ID/checkpoints
if [ -d "$DEST/$STEP" ]; then
  echo "already restored: $DEST/$STEP" >&2
else
  mkdir -p "$DEST"
  tar xzf "$TAR" -C "$DEST"
fi
echo "$DEST"
