#!/bin/bash
# Pack the framework for cluster transfer (analogue of the reference's
# pack_for_hpc.sh tar+scp helper).
set -euo pipefail
DEST=${1:?usage: pack_for_hpc.sh user@host:/path}
tar czf /tmp/cfdtpu.tar.gz \
    --exclude='.git' --exclude='__pycache__' --exclude='results' \
    cfdtpu main.py bench.py scripts tests pyproject.toml README.md Makefile
scp /tmp/cfdtpu.tar.gz "$DEST"
echo "packed and copied to $DEST"
