"""genOption CLI (reference source/genOption.cpp:8-114).
Usage: genOption prefix level[=1] csize[=2] threshold[=0.7] wsize[=7]
       minImageNum[=3] CPU[=8]"""
from __future__ import annotations

import sys


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) < 1:
        print("Usage: genOption prefix level[=1] csize[=2] "
              "threshold[=0.7] wsize[=7] minImageNum[=3] CPU[=8]",
              file=sys.stderr)
        return 1
    prefix = argv[0]
    args = [int(argv[1]) if len(argv) > 1 else 1,
            int(argv[2]) if len(argv) > 2 else 2,
            float(argv[3]) if len(argv) > 3 else 0.7,
            int(argv[4]) if len(argv) > 4 else 7,
            int(argv[5]) if len(argv) > 5 else 3,
            int(argv[6]) if len(argv) > 6 else 8]
    from ..models.gen_option import gen_option
    gen_option(prefix, *args)
    return 0


if __name__ == "__main__":
    sys.exit(main())
