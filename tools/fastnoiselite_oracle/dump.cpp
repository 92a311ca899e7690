// Oracle dump tool: samples the vendored FastNoiseLite exactly the way
// soil::noise does (op/noise.hpp), to validate the JAX reimplementation.
#pragma GCC diagnostic ignored "-Waggressive-loop-optimizations"
#include "/root/reference/source/soillib/external/FastNoiseLite.h"
#include <cstdio>
#include <cstdlib>

int main(int argc, char** argv) {
    int W = atoi(argv[1]), H = atoi(argv[2]);
    float extx = atof(argv[3]), exty = atof(argv[4]);
    float seed = atof(argv[5]);
    int octaves = argc > 6 ? atoi(argv[6]) : 8;
    float freq = argc > 7 ? atof(argv[7]) : 1.0f;
    float gain = argc > 8 ? atof(argv[8]) : 0.6f;
    float lac = argc > 9 ? atof(argv[9]) : 2.0f;

    FastNoiseLite source;
    source.SetNoiseType(FastNoiseLite::NoiseType_OpenSimplex2);
    source.SetFractalType(FastNoiseLite::FractalType_FBm);
    source.SetFrequency(freq);
    source.SetFractalOctaves(octaves);
    source.SetFractalGain(gain);
    source.SetFractalLacunarity(lac);

    for (int x = 0; x < W; ++x)
      for (int y = 0; y < H; ++y) {
        float v = source.GetNoise(x / extx, y / exty, seed);
        printf("%.9e\n", v);
      }
    return 0;
}
