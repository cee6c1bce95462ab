#!/bin/bash
# Replication-readiness driver (reference replication_scripts/README.md
# + pretrained/*.sh). Two legs:
#
#   ONLINE (needs network): fetch the upstream release weights +
#     datasets, then run every pretrained evaluation through the torch
#     weight importer — paper Tables 1-4 + supplement Table 1.
#   OFFLINE (this environment): rehearse the EXACT same code path on
#     synthesized fixtures (release-layout .pt -> restore_any ->
#     import_torch_checkpoint -> evaluate) with zero network.
#
# Usage:
#   bash replication_scripts/fetch_and_verify.sh            # auto
#   bash replication_scripts/fetch_and_verify.sh --offline  # force
set -euo pipefail
cd "$(dirname "$0")/.."

UPSTREAM=https://github.com/rubenwiersma/deltaconv
WEIGHTS_DIR=experiments/pretrained_weights
WEIGHTS=(modelnet40 scanobjectnn shapenet shapeseg shrec)

have_network() {
  # The upstream host must actually answer; zero-egress sandboxes fail
  # fast here and fall through to the offline rehearsal.
  curl -fsIL --max-time 10 "$UPSTREAM" > /dev/null 2>&1
}

fetch_weights() {
  mkdir -p "$WEIGHTS_DIR"
  local missing=0
  for name in "${WEIGHTS[@]}"; do
    local dst="$WEIGHTS_DIR/$name.pt"
    [ -s "$dst" ] && continue
    # The upstream repo ships the release weights in-tree
    # (reference README.md:60: "available in experiments/
    # pretrained_weights"); raw.githubusercontent serves them.
    local url="https://raw.githubusercontent.com/rubenwiersma/deltaconv/main/experiments/pretrained_weights/$name.pt"
    echo "fetching $url"
    if ! curl -fL --max-time 300 -o "$dst" "$url"; then
      echo "WARNING: could not fetch $name.pt" >&2
      rm -f "$dst"
      missing=1
    fi
  done
  return $missing
}

run_pretrained_evals() {
  # Datasets auto-download on first access inside each CLI (the
  # dataset classes' download() hooks); ScanObjectNN requires a manual
  # download (licensing) — its script reports the instructions and is
  # allowed to fail here.
  local failed=0
  for name in "${WEIGHTS[@]}"; do
    echo "=== pretrained eval: $name ==="
    if ! bash "replication_scripts/pretrained/$name.sh"; then
      echo "WARNING: pretrained/$name.sh failed" >&2
      failed=1
    fi
  done
  return $failed
}

if [ "${1:-}" != "--offline" ] && have_network; then
  echo "network available: fetching release weights + running the"
  echo "pretrained evaluations (paper Tables 1-4 + supplement)."
  # Partial failures are EXPECTED (e.g. ScanObjectNN's dataset needs a
  # manual download) — run every leg, then report the combined status
  # instead of letting set -e abort on the first miss.
  status=0
  fetch_weights || status=1
  run_pretrained_evals || status=1
  if [ "$status" -eq 0 ]; then
    echo "fetch_and_verify: ONLINE replication complete"
  else
    echo "fetch_and_verify: ONLINE replication finished WITH WARNINGS" \
         "(see above; rerun after resolving the missing pieces)" >&2
  fi
  exit "$status"
else
  echo "no network (or --offline): rehearsing the pretrained-eval"
  echo "code path on synthesized fixtures."
  python replication_scripts/offline_rehearsal.py
  echo "fetch_and_verify: offline rehearsal complete. When network"
  echo "exists, re-run without --offline to fetch $UPSTREAM"
  echo "release weights and the datasets, then evaluate for real."
fi
