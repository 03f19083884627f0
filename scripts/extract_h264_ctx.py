#!/usr/bin/env python3
"""Extract H.264 CABAC context-initialization (m, n) constants.

These are the standard-mandated values of ITU-T H.264 Tables 9-12..9-33
(the same constants every conforming implementation carries).  We read
them out of the JM reference's table layout
(/root/reference/jm18.5/lcommon/inc/ctx_tables.h) and emit a generated
Python data module.  Run from the repo root:

    python scripts/extract_h264_ctx.py > video_codecs_tpu/entropy/h264_ctx_data.py
"""

import re
import sys

SRC = "/root/reference/jm18.5/lcommon/inc/ctx_tables.h"

# (name, dims) — dims as in the declarations; first dim is the model
# (cabac_init_idc) count.  Frame-coding tables only (no FLD/MBAFF).
TABLES = [
    ("INIT_MB_TYPE_I", (1, 3, 11)),
    ("INIT_MB_TYPE_P", (3, 3, 11)),
    ("INIT_B8_TYPE_I", (1, 2, 9)),
    ("INIT_B8_TYPE_P", (3, 2, 9)),
    ("INIT_MV_RES_I", (1, 2, 10)),
    ("INIT_MV_RES_P", (3, 2, 10)),
    ("INIT_REF_NO_I", (1, 2, 6)),
    ("INIT_REF_NO_P", (3, 2, 6)),
    ("INIT_TRANSFORM_SIZE_I", (1, 1, 3)),
    ("INIT_TRANSFORM_SIZE_P", (3, 1, 3)),
    ("INIT_IPR_I", (1, 1, 2)),
    ("INIT_IPR_P", (3, 1, 2)),
    ("INIT_CIPR_I", (1, 1, 4)),
    ("INIT_CIPR_P", (3, 1, 4)),
    ("INIT_CBP_I", (1, 3, 4)),
    ("INIT_CBP_P", (3, 3, 4)),
    ("INIT_BCBP_I", (1, 22, 4)),
    ("INIT_BCBP_P", (3, 22, 4)),
    ("INIT_DELTA_QP_I", (1, 1, 4)),
    ("INIT_DELTA_QP_P", (3, 1, 4)),
    ("INIT_MAP_I", (1, 22, 15)),
    ("INIT_MAP_P", (3, 22, 15)),
    ("INIT_LAST_I", (1, 22, 15)),
    ("INIT_LAST_P", (3, 22, 15)),
    ("INIT_ONE_I", (1, 22, 5)),
    ("INIT_ONE_P", (3, 22, 5)),
    ("INIT_ABS_I", (1, 22, 5)),
    ("INIT_ABS_P", (3, 22, 5)),
]


def main():
    text = open(SRC, encoding="utf-8", errors="replace").read()
    text = re.sub(r"//[^\n]*", "", text)
    text = re.sub(r"/\*.*?\*/", "", text, flags=re.S)
    text = text.replace("CTX_UNUSED", "{0,64}").replace("CTX_UNDEF", "{0,63}")
    out = sys.stdout
    out.write('"""H.264 CABAC context initialization constants '
              '(GENERATED FILE).\n\n'
              "Standard-mandated (m, n) pairs of ITU-T H.264 spec Tables\n"
              "9-12..9-33, in the functional-group layout used by\n"
              "video_codecs_tpu.entropy.h264_cabac (frame coding, no\n"
              "MBAFF/field tables).  Regenerate with\n"
              "scripts/extract_h264_ctx.py.\n"
              '"""\n\nimport numpy as np\n\n')
    for name, dims in TABLES:
        m = re.search(
            r"static const char %s\s*\[[^=]*=\s*\{(.*?)\};" % name,
            text, re.S)
        assert m, name
        pairs = re.findall(r"\{\s*(-?\d+)\s*,\s*(-?\d+)\s*\}", m.group(1))
        total = dims[0] * dims[1] * dims[2]
        assert len(pairs) == total, (name, len(pairs), total)
        flat = [f"({a},{b})" for a, b in pairs]
        out.write(f"{name} = np.array([\n")
        for r in range(0, total, 8):
            out.write("    " + ", ".join(flat[r:r + 8]) + ",\n")
        out.write(f"], np.int32).reshape{dims + (2,)}\n\n")


if __name__ == "__main__":
    main()
