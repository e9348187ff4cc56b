// Native DIO + StoneMask F0 estimator.
//
// Algorithmic port of the WORLD pitch scheme (the reference calls the
// PyWORLD binding at preprocessor/preprocessor.py:256-261); numerics match
// the framework's numpy implementation (dsp/pitch.py) so either backend
// yields the same training targets. Offline CPU path, thread-parallel over
// filter channels / frames.
#pragma once

#include <vector>

namespace efs2 {

struct PitchOptions {
  double frame_period_ms = 5.805;  // hop / fs * 1000
  double f0_floor = 71.0;
  double f0_ceil = 800.0;
  double channels_in_octave = 2.0;
  double allowed_range = 0.1;
};

// Number of frames for a signal of length n at sampling rate fs:
// floor(n / fs * 1000 / frame_period) + 1 (PyWORLD convention).
int num_frames(int n, int fs, double frame_period_ms);

// DIO candidate search. f0 (unvoiced = 0) and frame times in seconds are
// written to the output vectors (resized to num_frames).
void dio(const double* x, int n, int fs, const PitchOptions& opt,
         std::vector<double>* f0, std::vector<double>* times);

// StoneMask refinement of voiced frames (in place).
void stonemask(const double* x, int n, int fs,
               const std::vector<double>& times, std::vector<double>* f0);

}  // namespace efs2

// C ABI for ctypes. Returns the number of frames written (<= capacity),
// or -1 on error.
extern "C" int efs2_estimate_f0(const double* x, int n, int fs,
                                double frame_period_ms, double f0_floor,
                                double f0_ceil, double* f0_out, int capacity);
