#!/usr/bin/env bash
# Keep the dev container alive (reference: entrypoint.sh does the same with
# tail -f); run the CLI with `docker compose exec app python -m llama_nuts_and_bolts_tpu.cli`.
set -e
echo "llama-nuts-and-bolts-tpu dev container ready."
exec tail -f /dev/null
