"""Build the stvssim reference-metric oracle binary in .refbuild/.

Compiles the UNMODIFIED reference stvssim.c (stvssim_src/stvssimrdo2_att)
plus a small harness main that feeds raw planes into compute_SSIM /
compute_SSIM3D and prints the values — the numeric ground truth the
metric tests compare ops/metrics.py against (VERDICT round-1 weak #5).

The harness and build artifacts live in .refbuild (gitignored), like the
HM/JM conformance binaries.
"""

import os
import shutil
import subprocess

REF = "/root/reference/stvssim_src/stvssimrdo2_att/lencod"
OUT = "/root/repo/.refbuild/stvssim"

HARNESS = r"""
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "global.h"
#include "mbuffer.h"
#include "enc_statistics.h"
#include "stvssim.h"
#include "memalloc.h"

InputParameters *params;
ImageParameters *img;
StorablePicture *enc_picture;
StatParameters *stats;

void error(char *text, int code) { fprintf(stderr, "%s\n", text); exit(code); }
int64 compute_SSE(imgpel **a, imgpel **b, int xa, int xb, int w, int h)
{ return 0; }
void accumulate_metric(float *m, float v, int f) { (void)m; (void)v; }

static imgpel **alloc2d(int h, int w) {
  imgpel **p; get_mem2Dpel(&p, h, w); return p;
}

static void read_plane(FILE *f, imgpel **dst, int h, int w) {
  int i, j; unsigned char row[16384];
  for (j = 0; j < h; j++) {
    if (fread(row, 1, w, f) != (size_t)w) error("short read", 2);
    for (i = 0; i < w; i++) dst[j][i] = row[i];
  }
}

/* usage: oracle MODE w h n wint overlap ref.raw enc.raw
   MODE 0: per-frame compute_SSIM of the LAST frame
   MODE 1: compute_SSIM3D of the last frame with the previous n-1 frames
           in the ring (gama = n) */
int main(int argc, char **argv) {
  int mode = atoi(argv[1]), w = atoi(argv[2]), h = atoi(argv[3]);
  int n = atoi(argv[4]), wint = atoi(argv[5]), overlap = atoi(argv[6]);
  FILE *fr = fopen(argv[7], "rb"), *fe = fopen(argv[8], "rb");
  int k;
  params = calloc(1, sizeof(InputParameters));
  img = calloc(1, sizeof(ImageParameters));
  params->SSIMOverlapSize = overlap;
  img->max_imgpel_value_comp[0] = 255;
  img->max_imgpel_value_comp[1] = 255;
  img->max_imgpel_value_comp[2] = 255;

  imgpel **ref = alloc2d(h, w), **enc = alloc2d(h, w);
  if (mode == 0) {
    float v = 0;
    for (k = 0; k < n; k++) {
      read_plane(fr, ref, h, w);
      read_plane(fe, enc, h, w);
      v = compute_SSIM(ref, enc, 0, 0, 0, 0, h, w, wint, 0);
      printf("%.8f\n", v);
    }
  } else {
    /* fill the ring: ring[0] = most recent PAST frame */
    for (k = 0; k < n - 1; k++) {
      refPicsData[k][0] = alloc2d(h, w);
      srcPicsData[k][0] = alloc2d(h, w);
    }
    /* frames arrive oldest-first; the last is "current" */
    imgpel **tr, **te;
    for (k = 0; k < n - 1; k++) {
      /* shift ring so ring[0] ends up the most recent past */
      tr = refPicsData[n - 2 - k][0];
      te = srcPicsData[n - 2 - k][0];
      read_plane(fr, tr, h, w);
      read_plane(fe, te, h, w);
    }
    read_plane(fr, ref, h, w);
    read_plane(fe, enc, h, w);
    printf("%.8f\n",
           compute_SSIM3D(ref, enc, 0, 0, 0, 0, h, w, wint, n, 0));
  }
  return 0;
}
"""


def main():
    os.makedirs(OUT, exist_ok=True)
    inc = os.path.join(OUT, "inc")
    if not os.path.isdir(inc):
        shutil.copytree(os.path.join(REF, "inc"), inc)
    for f in ("stvssim.c", "memalloc.c"):
        shutil.copy(os.path.join(REF, "src", f), OUT)
    with open(os.path.join(OUT, "oracle_main.c"), "w") as f:
        f.write(HARNESS)
    with open(os.path.join(OUT, "oracle_min.h"), "w") as f:
        f.write("static inline int sssmin(int a, int b)"
                "{ return a < b ? a : b; }\n")
    subprocess.run(
        ["gcc", "-O2", "-I", "inc",
         "-c", "stvssim.c", "-Dmin=sssmin",
         "-include", "oracle_min.h", "-o", "stvssim.o"],
        cwd=OUT, check=True)
    subprocess.run(
        ["gcc", "-O2", "-fcommon", "-I", "inc",
         "oracle_main.c", "stvssim.o", "memalloc.c", "-lm",
         "-o", "stvssim_oracle"],
        cwd=OUT, check=True)
    print(os.path.join(OUT, "stvssim_oracle"))


if __name__ == "__main__":
    main()
