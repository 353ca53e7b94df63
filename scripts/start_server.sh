#!/usr/bin/env bash
# Start the TTS server (Linux equivalent of the reference's 2_Start_Zonos.ps1).
set -euo pipefail
cd "$(dirname "$0")/.."
exec python3 -m zonos_tpu.serving.server "$@"
