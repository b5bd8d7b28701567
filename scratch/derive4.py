import re, numpy as np
src = open('/root/reference/lib/packet_impl.cc').read()
def parse_array(name, src=src):
    m = re.search(name + r"\[\]\s*=\s*\{([^}]*)\}", src)
    return np.array([int(x) for x in re.findall(r"\d+", m.group(1))], dtype=np.int64)
WHITE = parse_array(r"WHITENING_DATA"); IDX = parse_array(r"classic_packet::INDICES")
def win(clk, n=10): return np.array([WHITE[(IDX[clk]+k)%127] for k in range(n)])
w0 = win(0)
print("const (clk=0):", w0)
for i in range(6):
    d = win(1 << i) ^ w0
    print(f"clk bit {i} affects stream positions:", np.nonzero(d)[0])
