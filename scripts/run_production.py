#!/usr/bin/env python
"""Production entrypoint (reference: backend/run_production.py).

Single process (the job store lives in memory, like the reference's
workers=1 requirement); TPU graphs are shared through the in-process engine.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from amw_tpu.runtime.service import main  # noqa: E402

if __name__ == "__main__":
    host = os.environ.get("AMW_HOST", "0.0.0.0")
    port = int(os.environ.get("AMW_PORT", "8000"))
    main(host=host, port=port)
