// Oracle driver for tests/test_cxxsort.py: applies the REAL libstdc++
// std::sort to (key, payload-index) pairs compared by key only, and
// prints the payload permutation. The Python emulation in
// mashmap_tpu/map/cxxsort.py must match element-for-element.
//
// stdin:  n, then n int64 keys (whitespace separated), repeated until EOF
// stdout: one line per array: the payload indices after std::sort
#include <algorithm>
#include <cstdint>
#include <iostream>
#include <utility>
#include <vector>

int main() {
    std::ios::sync_with_stdio(false);
    long long n;
    while (std::cin >> n) {
        std::vector<std::pair<int64_t, int>> v(n);
        for (long long i = 0; i < n; i++) {
            std::cin >> v[i].first;
            v[i].second = (int)i;
        }
        std::sort(v.begin(), v.end(),
                  [](const std::pair<int64_t, int>& a,
                     const std::pair<int64_t, int>& b) {
                      return a.first < b.first;
                  });
        for (long long i = 0; i < n; i++)
            std::cout << v[i].second << (i + 1 < n ? ' ' : '\n');
        if (n == 0) std::cout << '\n';
    }
    return 0;
}
