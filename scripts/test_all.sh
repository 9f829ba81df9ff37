#!/bin/sh
# Full CI-style test run: quick suite first (fails fast on cheap
# breakage), then the slow integration tier. Both must be green.
set -e
cd "$(dirname "$0")/.."
echo "=== quick suite (-m 'not slow') ==="
python -m pytest tests/ -q -m "not slow"
echo "=== slow tier (-m slow) ==="
python -m pytest tests/ -q -m slow
