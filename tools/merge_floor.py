#!/usr/bin/env python3
"""Min-merge two full BenchFloor runs into one artifact: per-k chain minima
(slope/intercept re-fit on the merged minima), per-probe and per-query
minima; jobs/stages are structural and identical across runs; credits and
residuals recomputed from the merged quanta."""
import json, sys

def main():
    out, pa, pb = sys.argv[1], sys.argv[2], sys.argv[3]
    a, b = json.load(open(pa)), json.load(open(pb))
    ks = sorted(a['chain_by_k'], key=int)
    chain = {}
    for k in ks:
        ca, cb = a['chain_by_k'][k], b['chain_by_k'][k]
        # ADVICE r13: AQE-planned stage counts can legitimately differ
        # run-to-run; warn and take the counts from the faster run instead
        # of crashing on valid input pairs.
        if ca['jobs'] != cb['jobs'] or ca['stages'] != cb['stages']:
            print(f"WARN chain k={k}: jobs/stages differ across runs "
                  f"({ca['jobs']}/{ca['stages']} vs {cb['jobs']}/{cb['stages']}); "
                  f"taking the faster run's counts", file=sys.stderr)
        faster = ca if ca['sec'] <= cb['sec'] else cb
        chain[k] = {'sec': round(min(ca['sec'], cb['sec']), 4),
                    'jobs': faster['jobs'], 'stages': faster['stages']}
    xs = [int(k) for k in ks]; ys = [chain[k]['sec'] for k in ks]
    n = len(xs); sx = sum(xs); sy = sum(ys)
    sxx = sum(x*x for x in xs); sxy = sum(x*y for x, y in zip(xs, ys))
    slope = (n*sxy - sx*sy) / (n*sxx - sx*sx)
    intercept = (sy - slope*sx) / n
    t1 = chain['1']['sec']
    j0 = min(a['min_job_floor_sec'], b['min_job_floor_sec'])
    j1 = min(a['one_shuffle_action_floor_sec'], b['one_shuffle_action_floor_sec'])
    stream = {k: round(min(a['streaming_episode_floor_sec'][k],
                           b['streaming_episode_floor_sec'][k]), 4)
              for k in a['streaming_episode_floor_sec']}
    tail = {}
    for q in a['tail']:
        ta, tb = a['tail'][q], b['tail'][q]
        faster = ta if ta['sec'] <= tb['sec'] else tb
        jobs, stages = faster['jobs'], faster['stages']
        sec = min(ta['sec'], tb['sec'])
        credit = jobs*j0 + max(0, stages-jobs)*slope
        tail[q] = {'sec': round(sec, 4), 'jobs': jobs, 'stages': stages,
                   'floor_credit': round(credit, 4),
                   'residual_after_floor': round(sec-credit, 4),
                   'one_pass_equivalents': round(sec/t1, 4)}
    doc = {'metric': 'stage_floor_calibration', 'unit': 'sec',
           'sf': a['sf'], 'cpus': a['cpus'],
           'chain_by_k': chain,
           'per_barrier_floor_sec': round(slope, 4),
           'chain_intercept_sec': round(intercept, 4),
           'one_pass_full_table_agg_sec': round(t1, 4),
           'min_job_floor_sec': round(j0, 4),
           'one_shuffle_action_floor_sec': round(j1, 4),
           'streaming_episode_floor_sec': stream,
           'tail': tail,
           'runs_merged': 2,
           'methodology': a['methodology'] +
             ' MERGED: all timed fields are per-k / per-probe / per-query '
             'minima over 2 full independent runs (the BENCH_IDLE multi-'
             'repeat-minimum convention); slope/intercept re-fit on the '
             'merged chain minima; jobs/stages are structural and '
             'identical across runs; credits and residuals recomputed '
             'from the merged quanta.'}
    json.dump(doc, open(out, 'w'), indent=1)
    print(out, 'slope', doc['per_barrier_floor_sec'], 't1', t1)

if __name__ == '__main__':
    main()
