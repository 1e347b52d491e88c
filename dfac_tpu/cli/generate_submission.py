"""``dfac-generate-submission`` / ``python -m dfac_tpu.cli.generate_submission``.

Feature-parity target: reference ``scripts/generate_submission.py`` — same
positional argv contract and identical pickled artifact.
"""

from __future__ import annotations

import sys

from dfac_tpu.io.submission import generate_submission


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) != 6:
        raise ValueError(
            "Usage: dfac-generate-submission <features.pkl> <prediction.pkl> "
            "<Student_ID> <FirstName> <LastName> <Nickname>"
        )
    out = generate_submission(*argv)
    print(f"Submission file saved to: {out}")


if __name__ == "__main__":
    main()
