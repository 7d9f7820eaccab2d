"""Brute-force NumPy emulations of the reference algorithms.

These mirror the reference's C++/NumPy loops literally (slow, obviously
correct) and serve as golden oracles for the vectorized JAX ops.  They are
re-implementations from the documented semantics, used only in tests.
"""

import numpy as np


def shift_rights(right, subpix):
    out = [right]
    for ind in range(1, subpix):
        f = ind / subpix
        out.append(((1 - f) * right[:, :-1] + f * right[:, 1:]).astype(np.float32))
    return out


def census_sigs(img, w):
    h = w // 2
    H, W = img.shape
    out = {}
    for x in range(h, H - h):
        for y in range(h, W - h):
            bits = []
            for wx in range(x - h, x + h + 1):
                for wy in range(y - h, y + h + 1):
                    bits.append(1 if img[wx, wy] > img[x, y] else 0)
            out[(x, y)] = tuple(bits)
    return out


def census_cv(left, right, dmin, dmax, subpix, w):
    """census.cpp:97-180 loop."""
    H, W = left.shape
    h = w // 2
    D = (dmax - dmin) * subpix + 1
    cv = np.full((H, W, D), np.nan, np.float32)
    lsig = census_sigs(left, w)
    rsigs = [census_sigs(r, w) for r in shift_rights(left * 0 + right, subpix)]
    for row in range(h, H - h):
        for col in range(h, W - h):
            for disp in range(0, D, subpix):
                right_x = col + disp // subpix + dmin
                if right_x < h or right_x >= W - h:
                    continue
                for ir in range(subpix):
                    if disp + ir >= D:
                        break
                    if ir != 0 and right_x >= W - h - 1:
                        break
                    s = rsigs[ir][(row, right_x)]
                    l = lsig[(row, col)]
                    cv[row, col, disp + ir] = sum(a != b for a, b in zip(l, s))
    return cv


def disparity_range(dmin, dmax, subpix):
    if subpix == 1:
        return np.arange(dmin, dmax + 1, dtype=np.float64)
    return np.append(np.arange(dmin, dmax, 1.0 / subpix), [dmax])


def sad_ssd_cv(left, right, dmin, dmax, subpix, w, squared):
    """sad_ssd.py:140-368: pixel diff + strided window aggregation."""
    H, W = left.shape
    o = w // 2
    disps = disparity_range(dmin, dmax, subpix)
    D = len(disps)
    rights = shift_rights(right, subpix)
    pd = np.full((H, W, D), np.nan, np.float32)
    for k, d in enumerate(disps):
        i = int((d % 1) * subpix)
        r = rights[i]
        off = int(np.floor(d))
        for c in range(W):
            rc = c + off
            if 0 <= rc < r.shape[1]:
                diff = left[:, c] - r[:, rc]
                pd[:, c, k] = diff * diff if squared else np.abs(diff)
    cv = np.full((H, W, D), np.nan, np.float32)
    for rr in range(o, H - o):
        for cc in range(o, W - o):
            win = pd[rr - o : rr + o + 1, cc - o : cc + o + 1, :]
            cv[rr, cc, :] = win.sum((0, 1))  # NaN propagates
    return cv


def zncc_cv(left, right, dmin, dmax, subpix, w):
    """zncc.py:140-277."""
    H, W = left.shape
    o = w // 2
    disps = disparity_range(dmin, dmax, subpix)
    D = len(disps)
    rights = shift_rights(right, subpix)

    def win_mean(a, r, c):
        return a[r - o : r + o + 1, c - o : c + o + 1].mean()

    def win_std(a, r, c):
        x = a[r - o : r + o + 1, c - o : c + o + 1]
        return np.sqrt((x * x).mean() - x.mean() ** 2)

    cv = np.full((H, W, D), np.nan, np.float32)
    for k, d in enumerate(disps):
        i = int((d % 1) * subpix)
        r = rights[i]
        off = int(np.floor(d))
        for rr in range(o, H - o):
            for cc in range(o, W - o):
                rc = cc + off
                if rc - o < 0 or rc + o >= r.shape[1]:
                    continue
                lw = left[rr - o : rr + o + 1, cc - o : cc + o + 1]
                rw = r[rr - o : rr + o + 1, rc - o : rc + o + 1]
                num = (lw * rw).mean() - lw.mean() * rw.mean()
                den = win_std(left, rr, cc) * win_std(r, rr, rc)
                cv[rr, cc, k] = num / den if den > 0 else 0.0
    return cv
