import struct

VER = 0xFFFFFFFFFFFFFFF5

def parse_phmap(path, valfmt='u8'):
    """Parse phmap parallel_flat_hash_map dump (kreeq .map.N.bin / .map.hc.bin)."""
    data = open(path,'rb').read()
    off = 0
    (subcnt,) = struct.unpack_from('<Q', data, off); off += 8
    slotsz = 24 if valfmt=='u8' else 48
    entries = {}
    for s in range(subcnt):
        ver, size, cap = struct.unpack_from('<QQQ', data, off); off += 24
        assert ver == VER, (path, s, hex(ver))
        if size == 0: continue
        nctrl = cap + 17
        ctrl = data[off:off+nctrl]; off += nctrl
        found = 0
        for i in range(cap):
            if ctrl[i] & 0x80 == 0:
                so = off + i*slotsz
                key, = struct.unpack_from('<Q', data, so)
                if valfmt=='u8':
                    vals = struct.unpack_from('<9B', data, so+8)
                else:
                    vals = struct.unpack_from('<9I', data, so+8)
                entries[key] = vals
                found += 1
        off += cap*slotsz + 8  # slots + growth_left
        assert found == size, (path, s, found, size, cap)
    assert off == len(data), (path, off, len(data))
    return entries

def load_db(db):
    all_e = {}
    for m in range(128):
        for k_,v in parse_phmap(f'{db}/.map.{m}.bin').items():
            assert k_ % 128 == m
            all_e[k_] = v
    return all_e

if __name__ == '__main__':
    db = load_db('/root/reference/testFiles/test1.kreeq')
    print('entries:', len(db), 'sum cov:', sum(v[8] for v in db.values()),
          'unique:', sum(1 for v in db.values() if v[8]==1),
          'max bits:', max(k_.bit_length() for k_ in db))
    hc = parse_phmap('/root/reference/testFiles/test1.kreeq/.map.hc.bin', 'u32')
    print('hc entries:', len(hc))

    K=21
    CM={'A':0,'C':1,'G':2,'T':3,'a':0,'c':1,'g':2,'t':3}
    with open('/root/reference/testFiles/random1.fastq') as f:
        lines=f.read().splitlines()
    reads=[lines[i] for i in range(1,len(lines),4)]

    from collections import Counter
    c1,c2=Counter(),Counter()
    for r in reads:
        for p in range(len(r)-K+1):
            s=r[p:p+K]
            if any(ch not in CM for ch in s): continue
            vals=[CM[c] for c in s]
            fw1=0
            for v in vals: fw1 = fw1*4+v          # first base MSB
            rc1=0
            for v in reversed(vals): rc1 = rc1*4+(3-v)
            fw2=0
            for i,v in enumerate(vals): fw2 |= v << (2*i)   # first base LSB
            rc2=0
            for i,v in enumerate(reversed(vals)): rc2 |= (3-v) << (2*i)
            c1[min(fw1,rc1)]+=1
            c2[min(fw2,rc2)]+=1
    dbcov={k_:v[8] for k_,v in db.items()}
    print('E1 (MSB-first) full match:', dict(c1)==dbcov)
    print('E2 (LSB-first) full match:', dict(c2)==dbcov)
    print('E1 keys:', set(c1)==set(dbcov), ' E2 keys:', set(c2)==set(dbcov))
