#!/usr/bin/env bash
# Fetch the reference corpora into $GBNNS_DATA_DIR (default ~/gbnns_data)
# in the layout io/datasets.py resolves first:
#
#   $GBNNS_DATA_DIR/<name>/base.fvecs
#   $GBNNS_DATA_DIR/<name>/query.fvecs
#   $GBNNS_DATA_DIR/<name>/groundtruth.ivecs   (optional)
#
# Capability parity with the reference's download shell scripts
# (SURVEY.md §3 "Dataset registry" row). This build environment is fully
# offline (SURVEY.md §0) — there the registry falls back to synthetic
# stand-ins automatically and this script exits with a clear message; on
# a networked host it fetches the real TEXMEX corpora.
#
# Usage: scripts/download_datasets.sh [sift1m|gist1m|glove|deep10m ...]
#        (no args = sift1m gist1m)
set -euo pipefail

ROOT="${GBNNS_DATA_DIR:-$HOME/gbnns_data}"
mkdir -p "$ROOT"

have_net() {
  # TEXMEX host; 5s budget. `curl -Is` avoids downloading anything.
  curl -Is --connect-timeout 5 ftp://ftp.irisa.fr/ >/dev/null 2>&1 ||
    curl -Is --connect-timeout 5 http://ftp.irisa.fr/ >/dev/null 2>&1
}

fetch_texmex() { # name url_tarball inner_prefix
  local name="$1" url="$2" prefix="$3" dir="$ROOT/$1"
  if [[ -f "$dir/base.fvecs" && -f "$dir/query.fvecs" ]]; then
    echo "$name: already present in $dir"
    return
  fi
  mkdir -p "$dir"
  echo "$name: fetching $url"
  curl -L --retry 3 -o "$dir/archive.tar.gz" "$url"
  tar -xzf "$dir/archive.tar.gz" -C "$dir"
  mv "$dir/$prefix/${prefix}_base.fvecs" "$dir/base.fvecs"
  mv "$dir/$prefix/${prefix}_query.fvecs" "$dir/query.fvecs"
  mv "$dir/$prefix/${prefix}_groundtruth.ivecs" "$dir/groundtruth.ivecs" \
    2>/dev/null || true
  rm -rf "$dir/archive.tar.gz" "$dir/$prefix"
  echo "$name: done -> $dir"
}

if ! have_net; then
  cat >&2 <<EOF
No network route to the TEXMEX mirror (expected in the offline build
environment — io/datasets.py serves synthetic stand-ins automatically).
On a networked host, re-run this script; the expected final layout is:

  $ROOT/<name>/{base.fvecs,query.fvecs[,groundtruth.ivecs]}

Sources:
  sift1m  ftp://ftp.irisa.fr/local/texmex/corpus/sift.tar.gz
  gist1m  ftp://ftp.irisa.fr/local/texmex/corpus/gist.tar.gz
  glove   https://nlp.stanford.edu/data/glove.twitter.27B.zip
          (convert the 200d txt to fvecs: python -c "from gbnns_tpu.io.vecs
          import write_fvecs; ..." — vectors must be written row-per-record;
          io/datasets.py L2-normalizes angular corpora at load time)
  deep10m first 10M rows of Yandex DEEP1B learn/base split (.fbin);
          convert with gbnns_tpu.io.vecs.write_fvecs after np.fromfile
EOF
  exit 1
fi

for name in "${@:-sift1m gist1m}"; do
  case "$name" in
    sift1m) fetch_texmex sift1m \
      ftp://ftp.irisa.fr/local/texmex/corpus/sift.tar.gz sift ;;
    gist1m) fetch_texmex gist1m \
      ftp://ftp.irisa.fr/local/texmex/corpus/gist.tar.gz gist ;;
    glove|deep10m)
      echo "$name: no single-archive mirror — see the layout/source notes" \
           "printed by running this script offline, or io/datasets.py." ;;
    *) echo "unknown dataset: $name" >&2; exit 2 ;;
  esac
done
