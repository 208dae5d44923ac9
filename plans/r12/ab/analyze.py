import json, math, sys
def load(p): return json.load(open(p))['queries'], json.load(open(p))['value']
r10a,_t10a = load('plans/r12/ab/r10close_old_c32_run1.json')
r10b,_t10b = load('plans/r12/ab/r10close_old_c32_run2.json')
r11a,_t11a = load('plans/r12/ab/r11close_old_c32_run1.json')
r11b,_t11b = load('plans/r12/ab/r11close_old_c32_run2.json')
def geo(x, y):
    ks = set(x) & set(y)
    return math.exp(sum(math.log(y[k]/max(x[k],1e-9)) for k in ks)/len(ks)), len(ks)
# best-of-two-captures per tree kills capture noise
r10 = {k: min(r10a[k], r10b[k]) for k in set(r10a)&set(r10b)}
r11 = {k: min(r11a[k], r11b[k]) for k in set(r11a)&set(r11b)}
g,n = geo(r10, r11)
print(f"totals r10: {_t10a}/{_t10b}  r11: {_t11a}/{_t11b}")
print(f"best-of-captures totals r10={sum(r10.values()):.1f} r11={sum(r11.values()):.1f}")
print(f"geomean r11/r10 (best-of-captures, n={n}): {g:.3f}")
g1,_ = geo(r10a, r10b); g2,_ = geo(r11a, r11b)
print(f"same-tree capture-noise geomeans: r10 run2/run1 {g1:.3f}, r11 run2/run1 {g2:.3f}")
worst = sorted(((r11[k]/max(r10[k],1e-9), k) for k in r10), reverse=True)[:12]
print("worst r11/r10 best-of-captures:")
for r,k in worst: print(f"  {r:6.2f}x  r10={r10[k]:6.2f} r11={r11[k]:6.2f}  {k}")
