/* Literal transcription of the reference coefficient-sampling loop
 * (reference include/Diffusion.h:28-36 == tests/Poisson_LOD_Example.cc
 * problem_parameter ctor): unseeded rand() with float32 casts, written as a
 * standalone C program so the "golden rhs norm depends on platform rand()"
 * claim in PARITY.md is checkable against THIS machine's libc.
 *
 * Usage: ref_sampler MIN MAX REFINEMENT DIM   -> one value per line (%.17g)
 */
#include <math.h>
#include <stdio.h>
#include <stdlib.h>

int main(int argc, char **argv) {
  double min_val = argc > 1 ? atof(argv[1]) : 1.0;
  double max_val = argc > 2 ? atof(argv[2]) : 100.0;
  unsigned int refinement = argc > 3 ? (unsigned)atoi(argv[3]) : 8;
  unsigned int dim = argc > 4 ? (unsigned)atoi(argv[4]) : 2;
  unsigned int n_per_line = (unsigned)pow(2, refinement);
  unsigned int n_cells = (unsigned)pow(n_per_line, dim);
  for (unsigned int i = 0; i < n_cells; ++i) {
    const double v =
        min_val + (double)((float)rand() /
                           ((float)(RAND_MAX / (max_val - min_val))));
    printf("%.17g\n", v);
  }
  return 0;
}
