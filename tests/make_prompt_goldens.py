"""Regenerate tests/golden/prompt_*.txt from the current templates.

Run after a DELIBERATE prompt edit (and bump the prompt version for
behavioral changes): ``python tests/make_prompt_goldens.py``."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.test_prompts import GOLDEN_DIR, STAGE_CONTEXTS, render_text  # noqa: E402

if __name__ == "__main__":
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for stage in sorted(STAGE_CONTEXTS):
        path = os.path.join(GOLDEN_DIR, f"prompt_{stage}.txt")
        with open(path, "w") as f:
            f.write(render_text(stage))
        print("wrote", path)
