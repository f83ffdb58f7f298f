"""Make tools/ importable from tests (for reusing the canonical hash)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
