"""Slow, obviously-correct sequential emulator of the trico FP codec.

Implements the published recurrence (SURVEY.md §2 "Archive/stream format",
reference fps.c:86-210/576-800) value-by-value with Python ints. Used only in
tests to validate the vectorized closed-form implementation.
"""

import numpy as np


def seq_compress(values: np.ndarray, e1: int, e2: int) -> bytes:
    if values.dtype == np.float32:
        values = values.view(np.uint32)
    if values.dtype == np.float64:
        values = values.view(np.uint64)
    bits = 32 if values.dtype == np.uint32 else 64
    group = 8 if bits == 32 else 2
    fcm_max = 4 if bits == 32 else 8
    e1 = min((e1 >> 1) << 1, 30)
    e2 = min((e2 >> 1) << 1, 30)
    mask = (1 << bits) - 1
    m1 = (1 << e1) - 1
    m2 = (1 << e2) - 1
    t1: dict[int, int] = {}
    t2: dict[int, int] = {}
    h1 = h2 = pred1 = pred2 = last = 0
    out = bytearray()
    out.append(((e1 >> 1) << 4) | (e2 >> 1))
    out += int(len(values)).to_bytes(4, "big")

    xor1 = [0] * group
    xor2 = [0] * group
    bcode = [0] * group
    j = 0

    def emit_group():
        if bits == 32:
            bc = 0
            for k in range(8):
                bc |= bcode[k] << (3 * k)
            out.append((bc >> 16) & 0xFF)
            out.append((bc >> 8) & 0xFF)
            out.append(bc & 0xFF)
        else:
            out.append(bcode[0] | (bcode[1] << 4))
        for k in range(group):
            b = bcode[k]
            if b == 0:
                continue
            if b <= fcm_max:
                nbytes, res = b, xor1[k]
            else:
                nbytes, res = b - fcm_max, xor2[k]
            for q in range(nbytes - 1, -1, -1):
                out.append((res >> (8 * q)) & 0xFF)

    n = len(values)
    for i in range(n):
        j = i % group
        v = int(values[i])
        xor1[j] = v ^ pred1
        t1[h1] = v
        h1 = ((h1 << e1) ^ (v >> (bits - e1))) & m1 if e1 else 0
        pred1 = t1.get(h1, 0)
        stride = (v - last) & mask
        xor2[j] = v ^ ((last + pred2) & mask)
        last = v
        t2[h2] = stride
        h2 = ((h2 << (e2 // 2)) ^ (stride >> (bits - e2))) & m2 if e2 else 0
        pred2 = t2.get(h2, 0)

        # bcode ladder
        nb1 = 0
        x = xor1[j]
        while x:
            nb1 += 1
            x >>= 8
        nb2 = 1
        x = xor2[j] >> 8
        while x:
            nb2 += 1
            x >>= 8
        if nb1 >= 2 and nb2 < nb1 and nb2 <= (fcm_max - 1):
            bcode[j] = fcm_max + nb2
        else:
            bcode[j] = nb1
        if j == group - 1:
            emit_group()

    if n and j != group - 1:
        for k in range(j + 1, group):
            bcode[k] = 1
            xor1[k] = 0
        emit_group()
    return bytes(out)
