#!/usr/bin/env bash
# TPU-VM setup (Linux equivalent of the reference's Windows 1_Install.ps1).
# Installs optional host dependencies and builds the native components.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== zonos_tpu setup =="
python3 -c "import jax, flax, optax" || { echo "jax/flax/optax required"; exit 1; }

# Optional host packages (best-effort; the framework degrades gracefully):
#   espeak-ng  — maximal-quality multilingual G2P (else: the native 92-code C++ engine, docs/LANGUAGES.md)
#   ffmpeg     — mp3/ogg decode (else: wav only)
if command -v apt-get >/dev/null && [ "${ZONOS_SETUP_APT:-0}" = "1" ]; then
  sudo apt-get install -y espeak-ng ffmpeg || true
fi

# Native components.
make -C native all
echo "== setup complete =="
