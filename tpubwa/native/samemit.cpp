// Flat-path SE SAM record assembly: NM/MD + cigar strings + line formatting
// for a whole read batch in one native call.
//
// Clean-room counterpart of the per-record host loops in
// tpubwa/align/flatsam.py (python reference semantics:
// ops/global_align.py cigar_nm_md, align/finalize.py aln2sam field rules
// and REVCOMP_TRANS).  Reference analog: the batched worker_sam move,
// /root/reference/docs-archive/ARM-BATCHED-SAM-PLAN.md:27-111 — SAM text
// assembly was 76% of wall in the scalar path and was batched natively.
//
// The caller passes columnar per-lane arrays (flat lanes, ascending read
// index) plus pre-rendered text for non-flat reads; records are emitted in
// read order into one output buffer.  Returns the total byte count (which
// may exceed out_cap — caller re-invokes with a larger buffer; emission is
// cheap enough that the retry costs ~nothing).
#include <cstdint>
#include <cstring>

namespace {

const char MD_CHARS[] = "ACGTN";
const char CIGAR_OPS[] = "MIDSH";

struct Buf {
    uint8_t* p;
    int64_t cap;
    int64_t n;
    inline void putc(char c) {
        if (n < cap) p[n] = (uint8_t)c;
        n++;
    }
    inline void put(const uint8_t* s, int64_t len) {
        if (len <= 0) return;
        if (n + len <= cap) memcpy(p + n, s, (size_t)len);
        n += len;
    }
    inline void put_int(int64_t v) {
        char t[24];
        int k = 0;
        if (v < 0) { putc('-'); v = -v; }
        if (v == 0) { putc('0'); return; }
        while (v) { t[k++] = (char)('0' + v % 10); v /= 10; }
        while (k) putc(t[--k]);
    }
};

// complement table matching finalize.REVCOMP_TRANS
// "ACGTURYSWKMBDHVNacgturyswkmbdhvn" -> "TGCAAYRSWMKVHDBNtgcaayrswmkvhdbn"
struct CompTab {
    uint8_t t[256];
    CompTab() {
        const char* a = "ACGTURYSWKMBDHVNacgturyswkmbdhvn";
        const char* b = "TGCAAYRSWMKVHDBNtgcaayrswmkvhdbn";
        for (int i = 0; i < 256; i++) t[i] = (uint8_t)i;
        for (int i = 0; a[i]; i++) t[(uint8_t)a[i]] = (uint8_t)b[i];
    }
};
const CompTab COMP;

}  // namespace

extern "C" int64_t sam_emit_se(
    int64_t B,
    // per-read text for non-flat reads (unmapped/complex), [B+1] offsets
    const uint8_t* other, const int64_t* other_off,
    // per-read string buffers, [B+1] offsets each
    const uint8_t* name_buf, const int64_t* name_off,
    const uint8_t* seq_buf, const int64_t* seq_off,
    const uint8_t* qual_buf, const int64_t* qual_off,
    // contig names
    const uint8_t* cname_buf, const int64_t* cname_off,
    // flat lanes (ascending lane_b); lane_flag carries the FULL SAM flag
    // (paired/proper/mate bits included); lane_rev only orients SEQ/QUAL
    int64_t N,
    const int32_t* lane_b, const uint8_t* lane_rev,
    const int32_t* lane_flag,
    const int32_t* lane_rid, const int64_t* lane_pos1,
    const int32_t* lane_mapq, const int32_t* lane_score,
    // mate fields: rnext_rid -1 -> "*", -2 -> "=", else contig id
    const int32_t* rnext_rid, const int64_t* pnext, const int64_t* tlen,
    const int32_t* clip5, const int32_t* clip3,
    // cigar segment packs, cigar order, (len<<2 | op); [N, ga_k];
    // lead_d/trail_d: edge-deletion lengths squeezed OUT of the pack
    // (they still count for NM/MD, matching the generator path)
    const int32_t* cig_ns, const int32_t* cig_pack, int64_t ga_k,
    const int32_t* lead_d, const int32_t* trail_d,
    // NM/MD: nm_in >= 0 -> pure-M record, mismatches in mm_pos/mm_let;
    // nm_in < 0 -> walk the cigar over the window rows (win_row)
    const int32_t* nm_in,
    const uint8_t* mm_pos, const uint8_t* mm_let, int64_t mm_k,
    const int32_t* lq, const int32_t* rlen,
    const int32_t* win_row,
    const int8_t* qwin, const int8_t* twin, int64_t qpad, int64_t twinw,
    uint8_t* out, int64_t out_cap) {
    Buf ob{out, out_cap, 0};
    int64_t li = 0;
    for (int64_t b = 0; b < B; b++) {
        if (li >= N || lane_b[li] != b) {
            ob.put(other + other_off[b], other_off[b + 1] - other_off[b]);
            continue;
        }
        const int64_t i = li++;
        // --- QNAME, FLAG, RNAME, POS, MAPQ ---
        ob.put(name_buf + name_off[b], name_off[b + 1] - name_off[b]);
        ob.putc('\t');
        ob.put_int(lane_flag[i]);
        ob.putc('\t');
        const int32_t r = lane_rid[i];
        ob.put(cname_buf + cname_off[r], cname_off[r + 1] - cname_off[r]);
        ob.putc('\t');
        ob.put_int(lane_pos1[i]);
        ob.putc('\t');
        ob.put_int(lane_mapq[i]);
        ob.putc('\t');
        // --- CIGAR ---
        const int32_t ns = cig_ns[i];
        const int32_t* seg = cig_pack + i * ga_k;
        if (clip5[i]) { ob.put_int(clip5[i]); ob.putc('S'); }
        for (int32_t s = 0; s < ns; s++) {
            ob.put_int(seg[s] >> 2);
            ob.putc(CIGAR_OPS[seg[s] & 3]);
        }
        if (clip3[i]) { ob.put_int(clip3[i]); ob.putc('S'); }
        ob.putc('\t');
        // --- RNEXT / PNEXT / TLEN ---
        const int32_t nr = rnext_rid[i];
        if (nr == -1) ob.putc('*');
        else if (nr == -2) ob.putc('=');
        else ob.put(cname_buf + cname_off[nr],
                    cname_off[nr + 1] - cname_off[nr]);
        ob.putc('\t');
        ob.put_int(pnext[i]);
        ob.putc('\t');
        ob.put_int(tlen[i]);
        ob.putc('\t');
        // --- SEQ / QUAL (revcomp / reverse for reverse-strand hits) ---
        const uint8_t* sq = seq_buf + seq_off[b];
        const int64_t sl = seq_off[b + 1] - seq_off[b];
        if (lane_rev[i]) {
            if (ob.n + sl <= ob.cap)
                for (int64_t k = 0; k < sl; k++)
                    ob.p[ob.n + k] = COMP.t[sq[sl - 1 - k]];
            ob.n += sl;
        } else {
            ob.put(sq, sl);
        }
        ob.putc('\t');
        const uint8_t* qu = qual_buf + qual_off[b];
        const int64_t ql = qual_off[b + 1] - qual_off[b];
        if (ql == 0) {
            ob.putc('*');
        } else if (lane_rev[i]) {
            if (ob.n + ql <= ob.cap)
                for (int64_t k = 0; k < ql; k++)
                    ob.p[ob.n + k] = qu[ql - 1 - k];
            ob.n += ql;
        } else {
            ob.put(qu, ql);
        }
        // --- NM / MD ---
        int64_t nm = 0;
        uint8_t mdbuf[4096];
        Buf md{mdbuf, (int64_t)sizeof(mdbuf), 0};
        if (nm_in[i] >= 0) {
            // pure-M record with the mismatch pack (<= mm_k mismatches)
            nm = nm_in[i];
            const uint8_t* mp = mm_pos + i * mm_k;
            const uint8_t* ml = mm_let + i * mm_k;
            int32_t prev = 0;
            for (int64_t k = 0; k < nm; k++) {
                md.put_int((int64_t)mp[k] - prev);
                md.putc(MD_CHARS[ml[k] > 4 ? 4 : ml[k]]);
                prev = (int32_t)mp[k] + 1;
            }
            md.put_int((int64_t)lq[i] - prev);
        } else {
            // walk the PRE-SQUEEZE cigar over the window rows
            // (cigar_nm_md semantics): lead/trail deletions re-attached
            const int8_t* q = qwin + (int64_t)win_row[i] * qpad;
            const int8_t* t = twin + (int64_t)win_row[i] * twinw;
            int64_t qi = 0, ti = 0, run = 0;
            for (int32_t s = -1; s <= ns; s++) {
                int32_t op, ln;
                if (s < 0) {
                    if (!lead_d[i]) continue;
                    op = 2; ln = lead_d[i];
                } else if (s == ns) {
                    if (!trail_d[i]) continue;
                    op = 2; ln = trail_d[i];
                } else {
                    op = seg[s] & 3; ln = seg[s] >> 2;
                }
                if (op == 0) {          // M
                    int64_t prev = 0;
                    for (int32_t j = 0; j < ln; j++) {
                        const int8_t qc = q[qi + j], tc = t[ti + j];
                        if (qc != tc || qc >= 4) {
                            md.put_int(run + j - prev);
                            md.putc(MD_CHARS[tc > 4 ? 4 : tc]);
                            run = 0;
                            prev = j + 1;
                            nm++;
                        }
                    }
                    run += ln - prev;
                    qi += ln; ti += ln;
                } else if (op == 1) {   // I
                    qi += ln; nm += ln;
                } else {                // D
                    md.put_int(run);
                    run = 0;
                    md.putc('^');
                    for (int32_t j = 0; j < ln; j++)
                        md.putc(MD_CHARS[t[ti + j] > 4 ? 4 : t[ti + j]]);
                    nm += ln;
                    ti += ln;
                }
            }
            md.put_int(run);
        }
        ob.putc('\t');
        ob.put((const uint8_t*)"NM:i:", 5);
        ob.put_int(nm);
        ob.put((const uint8_t*)"\tMD:Z:", 6);
        ob.put(md.p, md.n < md.cap ? md.n : md.cap);
        ob.put((const uint8_t*)"\tAS:i:", 6);
        ob.put_int(lane_score[i]);
        ob.put((const uint8_t*)"\tXS:i:0\n", 8);
    }
    return ob.n;
}
