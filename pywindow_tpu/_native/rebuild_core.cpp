// Exact-parity BFS core for periodic molecule reconstruction.
//
// Replaces the per-level Python/numpy frontier expansion of
// pywindow_tpu.ops.rebuild.discrete_molecules with a C++ inner loop.
// Semantics are bit-compatible with the validated numpy implementation
// (itself validated against the reference's discrete_molecules,
// reference: utilities.py:820-1085):
//
//   * bond test: rcov_i + rcov_j - tol < d < rcov_i + rcov_j + tol with
//     the 0.1 < d < max_dist prefilter,
//   * terminal atoms are absorbed but never expanded,
//   * per-level discovery order: frontier atoms in order, unit-cell
//     neighbours by ascending index first, then supercell neighbours,
//     first-occurrence dedup by value identity,
//   * supercell images that coincide with a *currently unassigned*
//     unit-cell atom are skipped (they are reached through the unit
//     cell pool),
//   * frontier atoms leave the unassigned pool only after the whole
//     level is processed.
//
// Seed selection and the fractional-COM boundary filter stay on the
// host (numpy) where argmin ties at the 1e-15 level must reproduce
// sklearn/numpy arithmetic bitwise.
//
// Build: g++ -O3 -shared -fPIC -ffp-contract=off  (FMA contraction off:
// distance comparisons must match numpy's exact double arithmetic).

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <vector>
#include <unordered_set>

namespace {

inline double dist3(const double* a, const double* b) {
    const double dx = a[0] - b[0];
    const double dy = a[1] - b[1];
    const double dz = a[2] - b[2];
    // numpy reduces axis -1 as ((x^2 + y^2) + z^2)
    return std::sqrt((dx * dx + dy * dy) + dz * dz);
}

}  // namespace

extern "C" {

// Runs one molecule's BFS from `seed`. Returns the number of collected
// entries, or -1 if `cap` is too small. `unassigned` is mutated.
// out_src[k] = 0 (unit cell) / 1 (supercell); out_idx[k] indexes into
// the respective coordinate array.
long pw_bfs_molecule(
    long n, const double* coords, const double* cov,
    const uint8_t* heavy, const int64_t* key_id,
    long ns, const double* scoords, const double* scov,
    const uint8_t* sheavy, const int64_t* skey_id,
    const int64_t* s_match_unit,  // unit index with identical value, or -1
    double max_dist, double tol, long seed,
    uint8_t* unassigned,
    int32_t* out_src, int64_t* out_idx, long cap) {
    struct Entry { int32_t src; int64_t idx; };

    std::vector<Entry> frontier;
    std::unordered_set<int64_t> in_frontier, in_molecule, next_keys;
    std::vector<Entry> next;
    std::vector<uint8_t> pool(static_cast<size_t>(n));

    long count = 0;
    frontier.push_back({0, seed});
    in_frontier.insert(key_id[seed]);
    unassigned[seed] = 0;

    while (!frontier.empty()) {
        // level pool: unassigned atoms plus the current unit-cell frontier
        for (long j = 0; j < n; ++j) pool[j] = unassigned[j];
        for (const auto& e : frontier)
            if (e.src == 0) pool[e.idx] = 1;

        next.clear();
        next_keys.clear();

        for (const auto& e : frontier) {
            if (count >= cap) return -1;
            out_src[count] = e.src;
            out_idx[count] = e.idx;
            ++count;

            const bool is_heavy =
                e.src == 0 ? heavy[e.idx] != 0 : sheavy[e.idx] != 0;
            if (!is_heavy) continue;

            const double* pos =
                e.src == 0 ? coords + 3 * e.idx : scoords + 3 * e.idx;
            const double rc = e.src == 0 ? cov[e.idx] : scov[e.idx];

            // unit-cell neighbours, ascending index
            for (long j = 0; j < n; ++j) {
                if (!pool[j]) continue;
                if (e.src == 0 && j == e.idx) continue;
                const double d = dist3(pos, coords + 3 * j);
                if (!(d > 0.1) || !(d < max_dist)) continue;
                const double rcv = rc + cov[j];
                if (rcv - tol < d && d < rcv + tol) {
                    const int64_t k = key_id[j];
                    if (!in_frontier.count(k) && !next_keys.count(k)) {
                        next.push_back({0, j});
                        next_keys.insert(k);
                    }
                }
            }
            // supercell neighbours, ascending index
            for (long j = 0; j < ns; ++j) {
                const double d = dist3(pos, scoords + 3 * j);
                if (!(d > 0.1) || !(d < max_dist)) continue;
                const double rcv = rc + scov[j];
                if (!(rcv - tol < d && d < rcv + tol)) continue;
                const int64_t m = s_match_unit[j];
                if (m >= 0 && unassigned[m]) continue;
                const int64_t k = skey_id[j];
                if (!in_frontier.count(k) && !next_keys.count(k) &&
                    !in_molecule.count(k)) {
                    next.push_back({1, j});
                    next_keys.insert(k);
                }
            }
        }

        for (const auto& e : frontier) {
            in_molecule.insert(e.src == 0 ? key_id[e.idx]
                                          : skey_id[e.idx]);
            if (e.src == 0) unassigned[e.idx] = 0;
        }

        frontier.clear();
        in_frontier.clear();
        for (const auto& e : next) {
            const int64_t k = e.src == 0 ? key_id[e.idx] : skey_id[e.idx];
            if (in_molecule.count(k)) continue;
            frontier.push_back(e);
            in_frontier.insert(k);
            if (e.src == 0) unassigned[e.idx] = 0;
        }
    }
    return count;
}

// Fast frame decoder for DL_POLY HISTORY text blocks.
// Parses `text[0:len]` holding one frame (starting at its "timestep"
// line). Writes atom-id string offsets and coordinates. Returns the
// number of atoms, or -1 on parse error.
long pw_decode_dlpoly_frame(
    const char* text, long len, long keytrj, long has_cell,
    double* cell /*9, column lattice vectors as rows in file order*/,
    char* ids /*natoms * 9, zero-padded*/, double* xyz /*natoms * 3*/,
    double* vel /*natoms * 3 when keytrj >= 1, else may be null*/,
    double* frc /*natoms * 3 when keytrj == 2, else may be null*/,
    long cap_atoms) {
    long pos = 0;
    auto skip_ws = [&]() {
        while (pos < len &&
               (text[pos] == ' ' || text[pos] == '\t' ||
                text[pos] == '\r'))
            ++pos;
    };
    auto next_line = [&]() {
        while (pos < len && text[pos] != '\n') ++pos;
        if (pos < len) ++pos;
    };
    auto parse_double = [&](double* out) -> bool {
        skip_ws();
        if (pos >= len) return false;
        char* end = nullptr;
        *out = std::strtod(text + pos, &end);
        if (end == text + pos) return false;
        pos = end - text;
        return true;
    };

    next_line();  // timestep line (already validated by the mapper)
    if (has_cell) {
        for (int r = 0; r < 3; ++r) {
            for (int c = 0; c < 3; ++c)
                if (!parse_double(cell + 3 * r + c)) return -1;
            next_line();
        }
    }
    long atom = 0;
    while (pos < len) {
        skip_ws();
        if (pos >= len || text[pos] == '\n') break;
        if (atom >= cap_atoms) return -1;
        // record line: name  index  mass  charge
        long w0 = pos;
        while (pos < len && text[pos] != ' ' && text[pos] != '\t' &&
               text[pos] != '\n')
            ++pos;
        long wlen = pos - w0;
        if (wlen > 8) wlen = 8;
        for (long k = 0; k < 9; ++k)
            ids[atom * 9 + k] = k < wlen ? text[w0 + k] : '\0';
        next_line();
        // coordinates line
        double x, y, z;
        if (!parse_double(&x) || !parse_double(&y) || !parse_double(&z))
            return -1;
        xyz[atom * 3 + 0] = x;
        xyz[atom * 3 + 1] = y;
        xyz[atom * 3 + 2] = z;
        next_line();
        // velocity / force lines (parsed when an output buffer is
        // given, skipped otherwise)
        for (long s = 0; s < keytrj; ++s) {
            double* out3 = s == 0 ? vel : frc;
            if (out3 != nullptr) {
                double a, b, c;
                if (!parse_double(&a) || !parse_double(&b) ||
                    !parse_double(&c))
                    return -1;
                out3[atom * 3 + 0] = a;
                out3[atom * 3 + 1] = b;
                out3[atom * 3 + 2] = c;
            }
            next_line();
        }
        ++atom;
    }
    return atom;
}

// XYZ trajectory frame decoder: line 1 = atom count, line 2 = remark,
// then "name x y z" per atom.  Returns atoms parsed or -1 on error.
long pw_decode_xyz_frame(
    const char* text, long len,
    char* ids /*cap * 9, zero-padded*/, double* xyz /*cap * 3*/,
    long cap_atoms) {
    long pos = 0;
    auto next_line = [&]() {
        while (pos < len && text[pos] != '\n') ++pos;
        if (pos < len) ++pos;
    };
    auto skip_ws = [&]() {
        while (pos < len &&
               (text[pos] == ' ' || text[pos] == '\t' ||
                text[pos] == '\r'))
            ++pos;
    };
    auto parse_double = [&](double* out) -> bool {
        skip_ws();
        if (pos >= len) return false;
        char* end = nullptr;
        *out = std::strtod(text + pos, &end);
        if (end == text + pos) return false;
        pos = end - text;
        return true;
    };
    next_line();  // atom count (validated by the mapper)
    next_line();  // remark
    long atom = 0;
    while (pos < len) {
        skip_ws();
        if (pos >= len || text[pos] == '\n') {
            next_line();
            continue;
        }
        if (atom >= cap_atoms) return -1;
        long w0 = pos;
        while (pos < len && text[pos] != ' ' && text[pos] != '\t' &&
               text[pos] != '\n')
            ++pos;
        long wlen = pos - w0;
        if (wlen > 8) wlen = 8;
        for (long k = 0; k < 9; ++k)
            ids[atom * 9 + k] = k < wlen ? text[w0 + k] : '\0';
        double x, y, z;
        if (!parse_double(&x) || !parse_double(&y) || !parse_double(&z))
            return -1;
        xyz[atom * 3 + 0] = x;
        xyz[atom * 3 + 1] = y;
        xyz[atom * 3 + 2] = z;
        next_line();
        ++atom;
    }
    return atom;
}

// PDB trajectory frame decoder: fixed-column ATOM/HETATM records
// (atom name cols 13-16, coordinates cols 31-54) plus the CRYST1 cell
// (a,b,c,alpha,beta,gamma).  Returns atoms parsed or -1 on error;
// *has_cryst is set when a non-zero CRYST1 was found.
long pw_decode_pdb_frame(
    const char* text, long len,
    char* ids /*cap * 9*/, double* xyz /*cap * 3*/,
    double* cryst /*6*/, long* has_cryst, long cap_atoms) {
    long pos = 0;
    *has_cryst = 0;
    auto fixed_double = [&](long start, long width, double* out) -> bool {
        char buf[16];
        if (width > 15) return false;
        for (long k = 0; k < width; ++k) {
            char c = (pos + start + k < len) ? text[pos + start + k] : ' ';
            buf[k] = (c == '\n') ? ' ' : c;
        }
        buf[width] = '\0';
        char* end = nullptr;
        *out = std::strtod(buf, &end);
        return end != buf;
    };
    long atom = 0;
    while (pos < len) {
        long line_len = 0;
        while (pos + line_len < len && text[pos + line_len] != '\n')
            ++line_len;
        if (line_len >= 6) {
            bool is_atom =
                std::strncmp(text + pos, "HETATM", 6) == 0 ||
                std::strncmp(text + pos, "ATOM  ", 6) == 0;
            if (is_atom) {
                if (atom >= cap_atoms || line_len < 54) return -1;
                // atom name: cols 12..15, stripped
                long s = 12, e = 16;
                while (s < e && text[pos + s] == ' ') ++s;
                while (e > s && text[pos + e - 1] == ' ') --e;
                long wlen = e - s;
                if (wlen > 8) wlen = 8;
                for (long k = 0; k < 9; ++k)
                    ids[atom * 9 + k] =
                        k < wlen ? text[pos + s + k] : '\0';
                double x, y, z;
                if (!fixed_double(30, 8, &x) || !fixed_double(38, 8, &y) ||
                    !fixed_double(46, 8, &z))
                    return -1;
                xyz[atom * 3 + 0] = x;
                xyz[atom * 3 + 1] = y;
                xyz[atom * 3 + 2] = z;
                ++atom;
            } else if (std::strncmp(text + pos, "CRYST1", 6) == 0 &&
                       line_len >= 54) {
                double v[6];
                bool ok = fixed_double(6, 9, &v[0]) &&
                          fixed_double(15, 9, &v[1]) &&
                          fixed_double(24, 9, &v[2]) &&
                          fixed_double(33, 7, &v[3]) &&
                          fixed_double(40, 7, &v[4]) &&
                          fixed_double(47, 7, &v[5]);
                if (ok && v[0] + v[1] + v[2] != 0.0) {
                    for (int k = 0; k < 6; ++k) cryst[k] = v[k];
                    *has_cryst = 1;
                }
            }
        }
        pos += line_len;
        if (pos < len) ++pos;  // consume newline
    }
    return atom;
}

}  // extern "C"
