#!/usr/bin/env bash
# Build the kafka2delta_spark wheel (packaging parity with the reference's
# released wheel, /root/reference/pyproject.toml + .github/workflows/release.yaml).
#
# This container's pyenv python has setuptools 65.5 but NOT the `wheel`
# package, and installing packages is forbidden — so the build shims the
# system python's Debian-packaged wheel module (code + egg-info metadata,
# which setuptools needs to discover the bdist_wheel entry point) onto
# PYTHONPATH for the build subprocess only. Nothing is installed.
#
# Usage: tools/build_wheel.sh [outdir]   (default: dist/)
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
OUT="${1:-$REPO/dist}"
SHIM="$(mktemp -d)"
trap 'rm -rf "$SHIM"' EXIT
ln -s /usr/lib/python3/dist-packages/wheel "$SHIM/wheel"
ln -s /usr/lib/python3/dist-packages/wheel-*.egg-info "$SHIM/" 2>/dev/null || true
cd /tmp  # keep the repo dir off sys.path so the build reads only the sdist tree
PYTHONPATH="$SHIM" pip wheel "$REPO" --no-deps --no-build-isolation -w "$OUT"
ls -l "$OUT"/kafka2delta_spark-*.whl
