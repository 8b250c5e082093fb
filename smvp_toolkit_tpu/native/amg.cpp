// Native fast path for smoothed-aggregation setup (models/amg.py).
//
// Greedy standard aggregation over a symmetric strength graph (CSR
// pattern, diagonal-free). Mirrors models/amg.py::_aggregate
// pass-for-pass — pure integer work, so the outputs are identical
// arrays (tests/test_amg.py differential test). The pass is
// inherently sequential (pass-1 seeding reads its own earlier
// assignments), which is why the Python loop cannot be vectorized
// away and a native twin pays off at ~1M rows.

extern "C" {

// agg[n] receives the aggregate id of each node; returns the count.
long long aggregate_pass(const long long* indptr,
                         const long long* indices,
                         long long n, long long* agg) {
  for (long long i = 0; i < n; ++i) agg[i] = -1;
  long long nxt = 0;
  // Pass 1: seed an aggregate wherever the whole strong neighborhood
  // is untouched.
  for (long long i = 0; i < n; ++i) {
    if (agg[i] != -1) continue;
    bool untouched = true;
    for (long long t = indptr[i]; t < indptr[i + 1]; ++t) {
      if (agg[indices[t]] != -1) {
        untouched = false;
        break;
      }
    }
    if (untouched) {
      agg[i] = nxt;
      for (long long t = indptr[i]; t < indptr[i + 1]; ++t)
        agg[indices[t]] = nxt;
      ++nxt;
    }
  }
  // Pass 2: attach leftovers to the first aggregated neighbor.
  for (long long i = 0; i < n; ++i) {
    if (agg[i] != -1) continue;
    for (long long t = indptr[i]; t < indptr[i + 1]; ++t) {
      const long long a = agg[indices[t]];
      if (a != -1) {
        agg[i] = a;
        break;
      }
    }
  }
  // Pass 3: singletons for whatever remains.
  for (long long i = 0; i < n; ++i)
    if (agg[i] == -1) agg[i] = nxt++;
  return nxt;
}

}  // extern "C"
