"""Read-threading de Bruijn graph, sequence graph, and K-best haplotypes.

Reimplements the reference's assembler core (reference: src/haplotypecaller/
apply/assemble/hc_assemble_read_threading_graph.c,
hc_assemble_read_threading_assembler.c:42-143, hc_assemble_chain_pruner.c,
hc_assemble_seq_graph.c, hc_assemble_dijkstra_shortest_path.c; all GATK
ReadThreadingAssembler semantics) with plain Python data structures:

- kmers that repeat within any single input sequence are "non-unique"; reads
  start threading at their first unique kmer; non-unique kmers get a fresh
  vertex per context (repeat-safe threading)
- low-weight chain pruning (all edges multiplicity < 2, no ref edge)
- cycle detection fails assembly for this kmer size (callers retry larger k)
- low-complexity check: non-unique kmers * 4 > vertex count fails assembly
- conversion to a sequence graph with linear chains zipped
- K-best haplotype search: priority queue by path score (sum of
  log10(edge multiplicity / total outgoing)), per-vertex expansion cap and
  result cap of 128, deterministic tie-breaks by path sequence
"""

import heapq
import itertools
import math

from .. import constants as C

PRUNE_FACTOR = 2          # hc_assemble.h:16
LOW_QUAL_MUL = 4          # hc_assemble_read_threading_assembler.c:25
MAX_HAPLOTYPES = 128      # hc_assemble_dijkstra_shortest_path.c:22
MIN_ASSEMBLY_QUAL = 10    # hc_assemble.h:9 (usable_for_assembly threshold)


class Vertex:
    __slots__ = ("kmer", "uid", "in_edges", "out_edges")
    _ids = itertools.count()

    def __init__(self, kmer):
        self.kmer = kmer
        self.uid = next(Vertex._ids)
        self.in_edges = {}    # source Vertex -> Edge
        self.out_edges = {}   # target Vertex -> Edge

    @property
    def in_degree(self):
        return len(self.in_edges)

    @property
    def out_degree(self):
        return len(self.out_edges)

    def __repr__(self):
        return f"V({self.kmer.decode()}#{self.uid})"


class Edge:
    __slots__ = ("multiplicity", "is_ref")

    def __init__(self, multiplicity=0, is_ref=False):
        self.multiplicity = multiplicity
        self.is_ref = is_ref


def _sequence_kmer_counts(seq, k):
    counts = {}
    for i in range(len(seq) - k + 1):
        km = seq[i:i + k]
        counts[km] = counts.get(km, 0) + 1
    return counts


class ReadThreadingGraph:
    """GATK-style read-threading graph for one kmer size."""

    def __init__(self, kmer_size):
        self.k = kmer_size
        self.vertices = []
        self.unique_vertex = {}       # kmer -> Vertex (unique kmers only)
        self.non_unique = set()
        self.ref_source = None
        self.ref_sink = None

    # --- construction ---
    def determine_non_unique_kmers(self, sequences):
        """Kmers occurring more than once within any single sequence
        (GATK determineNonUniques)."""
        k = self.k
        nu = self.non_unique
        for seq in sequences:
            seen = set()
            add_seen = seen.add
            for i in range(len(seq) - k + 1):
                km = seq[i:i + k]
                if km in seen:
                    nu.add(km)
                else:
                    add_seen(km)

    def ref_has_non_unique_kmers(self, ref):
        return any(n > 1 for n in _sequence_kmer_counts(ref, self.k).values())

    def _new_vertex(self, kmer, unique):
        v = Vertex(kmer)
        self.vertices.append(v)
        if unique:
            self.unique_vertex[kmer] = v
        return v

    def _get_or_create(self, kmer):
        if kmer in self.non_unique:
            return self._new_vertex(kmer, unique=False)
        v = self.unique_vertex.get(kmer)
        if v is None:
            v = self._new_vertex(kmer, unique=True)
        return v

    def _add_edge(self, u, v, is_ref):
        e = u.out_edges.get(v)
        if e is None:
            e = Edge(0, False)
            u.out_edges[v] = e
            v.in_edges[u] = e
        e.multiplicity += 1
        e.is_ref |= is_ref
        return e

    def thread_sequence(self, seq, is_ref=False):
        """Thread one sequence through the graph (GATK threadSequence)."""
        k = self.k
        if len(seq) < k:
            return
        if is_ref:
            start = 0
        else:
            # the reference's start scan EXCLUDES the final kmer position
            # (find_seq_kmer_start: i < len - kmer,
            # hc_assemble_read_threading_graph.c:126-146)
            start = None
            for i in range(len(seq) - k):
                if seq[i:i + k] not in self.non_unique:
                    start = i
                    break
            if start is None:
                return
        v = self._get_or_create(seq[start:start + k])
        # propagate support backwards from the threading start: edges into
        # the starting vertex whose chain spells the starting kmer get +1
        # (hc_assemble_graph_increase_counts_in_matched_kmers,
        # hc_assemble_read_threading_graph.c:187-208; GATK
        # increaseCountsInMatchedKmers). Without this, reads whose first
        # unique kmer lands mid-chain leave weight-1 dips that break the
        # dangling-end LCA walk's prune-factor reset.
        kmer0 = seq[start:start + k]
        cur, off = v, k - 2
        while off >= 0 and cur.in_degree == 1:
            (prev, edge) = next(iter(cur.in_edges.items()))
            if prev.kmer[-1] != kmer0[off]:
                break
            edge.multiplicity += 1
            cur, off = prev, off - 1
        if is_ref:
            self.ref_source = v
        for i in range(start + 1, len(seq) - k + 1):
            nb = seq[i + k - 1]  # int byte: avoids slicing in the scan below
            # extend along an existing out-edge whose vertex ends in next_base
            target = None
            for cand in v.out_edges:
                if cand.kmer[-1] == nb:
                    target = cand
                    break
            if target is None:
                kmer = seq[i:i + k]
                if (not is_ref and self.ref_source is not None
                        and kmer == self.ref_source.kmer):
                    # never merge a read path back into the reference
                    # SOURCE vertex — a fresh duplicate is created instead
                    # (get_kmer_vertex, hc_assemble_read_threading_graph.c:
                    # 235-250)
                    target = self._new_vertex(kmer, unique=False)
                else:
                    target = self._get_or_create(kmer)
                e = Edge(0, False)
                v.out_edges[target] = e
                target.in_edges[v] = e
            else:
                e = v.out_edges[target]
            e.multiplicity += 1
            e.is_ref |= is_ref
            v = target
        if is_ref:
            self.ref_sink = v

    # --- graph cleanup ---
    def remove_vertices(self, dead):
        dead = set(dead)
        for v in dead:
            for u, e in list(v.in_edges.items()):
                u.out_edges.pop(v, None)
            for w, e in list(v.out_edges.items()):
                w.in_edges.pop(v, None)
        self.vertices = [v for v in self.vertices if v not in dead]
        self.unique_vertex = {k: v for k, v in self.unique_vertex.items()
                              if v not in dead}

    def has_cycle(self):
        """Iterative 3-color DFS over the whole graph."""
        WHITE, GRAY, BLACK = 0, 1, 2
        color = {v: WHITE for v in self.vertices}
        for root in self.vertices:
            if color[root] != WHITE:
                continue
            stack = [(root, iter(root.out_edges))]
            color[root] = GRAY
            while stack:
                v, it = stack[-1]
                adv = next(it, None)
                if adv is None:
                    color[v] = BLACK
                    stack.pop()
                elif color[adv] == GRAY:
                    return True
                elif color[adv] == WHITE:
                    color[adv] = GRAY
                    stack.append((adv, iter(adv.out_edges)))
        return False

    def is_low_quality(self):
        """Non-unique kmers more than ~20% of vertices
        (hc_assemble_graph_is_low_quality_graph)."""
        return len(self.non_unique) * LOW_QUAL_MUL > max(1, len(self.vertices))

    def prune_low_weight_chains(self, prune_factor=PRUNE_FACTOR):
        """Remove linear chains where every edge has multiplicity <
        prune_factor and none is a reference edge (hc_assemble_chain_pruner.c).

        Discovery and removal are TWO phases: chains are enumerated from the
        graph sources (chain ends become new chain starts) on the FROZEN
        graph, then removed together. Interleaving them is order-dependent:
        removing one of two error paths that merge before a supported tail
        degrades the merge vertex to a pass-through, and the second chain's
        walk then runs into the supported tail and is spared
        (hc_assemble_chain_pruner.c:28-60 collects all_path first)."""
        chain_starts = [v for v in self.vertices
                        if v.in_degree == 0 and v.out_degree]
        seen_starts = set(id(v) for v in chain_starts)
        chains = []
        qi = 0
        while qi < len(chain_starts):
            u = chain_starts[qi]
            qi += 1
            for v0, e0 in u.out_edges.items():
                chain = [(u, v0, e0)]
                last = v0
                while (last.out_degree == 1 and last.in_degree <= 1
                       and last is not u):
                    (nxt, e) = next(iter(last.out_edges.items()))
                    chain.append((last, nxt, e))
                    last = nxt
                chains.append(chain)
                if id(last) not in seen_starts:
                    seen_starts.add(id(last))
                    chain_starts.append(last)
        removed = 0
        for chain in chains:
            if all(e.multiplicity < prune_factor and not e.is_ref
                   for _, _, e in chain):
                for a, b, e in chain:
                    if a.out_edges.get(b) is e:
                        del a.out_edges[b]
                        del b.in_edges[a]
                removed += 1
        self.remove_singleton_orphans()
        return removed

    def remove_singleton_orphans(self):
        dead = [v for v in self.vertices
                if v.in_degree == 0 and v.out_degree == 0
                and v is not self.ref_source]
        if dead:
            self.remove_vertices(dead)

    def remove_paths_not_connected_to_ref(self):
        """Keep vertices on some ref_source -> ref_sink path direction-wise
        (hc_assemble_graph_remove_paths_not_connected_to_ref)."""
        fwd = self._reach(self.ref_source, forward=True)
        bwd = self._reach(self.ref_sink, forward=False)
        keep = fwd & bwd
        self.remove_vertices([v for v in self.vertices if v not in keep])

    def _reach(self, start, forward):
        seen = set()
        if start is None:
            return seen
        stack = [start]
        while stack:
            v = stack.pop()
            if v in seen:
                continue
            seen.add(v)
            nxt = v.out_edges if forward else v.in_edges
            stack.extend(n for n in nxt if n not in seen)
        return seen

    # --- dangling-end recovery (hc_assemble_base_graph.c:123-930; GATK
    #     recoverDanglingTails / recoverDanglingHeads legacy) ---
    MIN_DANGLING_BRANCH_LENGTH = 4     # hc_assemble_base_graph.h:5
    MAX_CIGAR_COMPLEXITY = 3

    def _is_reference_vertex(self, v):
        return (any(e.is_ref for e in v.out_edges.values())
                or any(e.is_ref for e in v.in_edges.values()))

    @staticmethod
    def _has_ref_out_edge(v):
        """is_reference_node (hc_assemble_base_graph.c:414-425): only a
        reference OUT-edge qualifies (the ref sink does not)."""
        return v is not None and any(e.is_ref for e in v.out_edges.values())

    def _path_bases(self, path, expand_source=False):
        out = []
        for i, v in enumerate(path):
            if expand_source and v.in_degree == 0:
                out.append(v.kmer)
            else:
                out.append(v.kmer[-1:])
        return b"".join(out)

    def _find_path_upwards_to_lca(self, vertex, prune_factor=PRUNE_FACTOR):
        """[LCA, ..., vertex] or None (find_path_upwards_to_lowest_common_
        ancestor; low-weight edges reset the collected path)."""
        path = []
        visited = set()
        v = vertex
        while (v is not None and v.in_degree == 1
               and not (v.in_degree != 1 or v.out_degree >= 2)):
            (parent, edge) = next(iter(v.in_edges.items()))
            if edge.multiplicity < prune_factor:
                path = []
            else:
                path.insert(0, v)
            v = parent
            if id(v) in visited:
                return None
            visited.add(id(v))
        if v is not None:
            path.insert(0, v)
        if v is not None and v.out_degree > 1:
            return path
        return None

    @staticmethod
    def _heaviest_incoming_edge(v):
        """Heaviest incoming edge with multiplicity > 1, or None
        (hc_assemble_base_graph_get_heaviest_incoming_edge)."""
        best = None
        for _parent, e in v.in_edges.items():
            if e.multiplicity == 1:
                continue
            if best is None or e.multiplicity > best.multiplicity:
                best = e
        return best

    def _reference_path_downward(self, start, blacklisted_edge):
        """Downward path from `start`: a reference edge when present, else
        the single non-blacklisted outgoing edge; None on a cycle
        (get_reference_path + get_next_reference_vertex with
        allowNonRefPaths=1, hc_assemble_base_graph.c:212-309)."""
        path = [start]
        seen = {id(start)}
        v = start
        while True:
            nxt = None
            for w, e in v.out_edges.items():
                if e.is_ref:
                    nxt = w
                    break
            if nxt is None:
                cand = [w for w, e in v.out_edges.items()
                        if e is not blacklisted_edge]
                nxt = cand[0] if len(cand) == 1 else None
            if nxt is None:
                break
            if id(nxt) in seen:
                return None
            path.append(nxt)
            seen.add(id(nxt))
            v = nxt
        return path

    def _reference_path_from(self, start, forward):
        """Vertices from `start` following reference edges."""
        path = [start]
        v = start
        seen = {id(start)}
        while True:
            nxt = None
            edges = v.out_edges if forward else v.in_edges
            for w, e in edges.items():
                if e.is_ref:
                    nxt = w
                    break
            if nxt is None or id(nxt) in seen:
                break
            path.append(nxt)
            seen.add(id(nxt))
            v = nxt
        return path

    @staticmethod
    def _longest_suffix_match(ref_seq, alt_seq, ref_end_index):
        n = 0
        i, j = ref_end_index, len(alt_seq) - 1
        while i >= 0 and j >= 0 and ref_seq[i] == alt_seq[j]:
            n += 1
            i -= 1
            j -= 1
        return n

    def recover_dangling_tails(self):
        from .sw import DANGLING_END_PARAMS, OverhangStrategy, sw_align
        from ..reads.cigar import CigarOp

        recovered = 0
        for v in list(self.vertices):
            if v.out_degree != 0 or v is self.ref_sink:
                continue
            path = self._find_path_upwards_to_lca(v)
            if (path is None
                    or len(path) < self.MIN_DANGLING_BRANCH_LENGTH + 1
                    or path[0] is self.ref_source):
                continue
            lca = path[0]
            # the LCA need NOT be a reference vertex: the downward "ref"
            # path follows ref edges where present and otherwise the single
            # non-blacklisted outgoing edge (get_next_reference_vertex with
            # allowNonRefPaths, hc_assemble_base_graph.c:212-260) — this is
            # what reconnects dangling tails that branch off ALT paths
            blacklisted = (self._heaviest_incoming_edge(path[1])
                           if len(path) > 1 else None)
            ref_path = self._reference_path_downward(lca, blacklisted)
            if ref_path is None or len(ref_path) < 2:
                continue
            alt_seq = self._path_bases(path)
            ref_seq = self._path_bases(ref_path)
            try:
                res = sw_align(ref_seq, alt_seq, DANGLING_END_PARAMS,
                               OverhangStrategy.LEADING_INDEL)
            except ValueError:
                continue
            elems = [list(e) for e in res.cigar.elements]
            while elems and elems[-1][0] in (CigarOp.D,):
                elems.pop()
            if not elems or len(elems) > self.MAX_CIGAR_COMPLEXITY:
                continue
            if elems[-1][0] != CigarOp.M:
                continue
            last_ref_index = sum(n for op, n in elems
                                 if op in (CigarOp.M, CigarOp.D)) - 1
            matching_suffix = min(
                self._longest_suffix_match(ref_seq, alt_seq, last_ref_index),
                elems[-1][1])
            if matching_suffix == 0:
                continue
            cigar_read_len = sum(n for op, n in elems
                                 if op in (CigarOp.M, CigarOp.I))
            alt_index = max(cigar_read_len - matching_suffix - 1, 0)
            leading_del = (elems[0][0] == CigarOp.D
                           and elems[0][1] + matching_suffix
                           == last_ref_index + 1)
            ref_index = (last_ref_index - matching_suffix + 1
                         + (1 if leading_del else 0))
            if ref_index == 0 or ref_index >= len(ref_path) \
                    or alt_index >= len(path):
                continue
            alt_v = path[alt_index]
            ref_v = ref_path[ref_index]
            if ref_v not in alt_v.out_edges:
                e = Edge(1, False)
                alt_v.out_edges[ref_v] = e
                ref_v.in_edges[alt_v] = e
                recovered += 1
        return recovered

    def recover_dangling_heads(self):
        """Legacy head recovery: prefix match on reversed sequences with a
        mismatch budget of branch_length/kmer
        (merge_dangling_head_legacy, best_prefix_match_legacy)."""
        from .sw import DANGLING_END_PARAMS, OverhangStrategy, sw_align
        from ..reads.cigar import CigarOp

        recovered = 0
        for v in list(self.vertices):
            if v.in_degree != 0 or v is self.ref_source:
                continue
            # walk down to the highest common descendant on the ref path;
            # LOW-WEIGHT edges reset the collected path — a branch whose
            # edges never reach the prune factor cannot be recovered
            # (find_path_downwards_to_highest_common_descendant_of_
            # reference, hc_assemble_base_graph.c:440-485). This is what
            # keeps 1-read sequencing-error branches out of the graph.
            path = []
            w = v
            ok = True
            visited = {id(v)}
            while (w is not None and w.out_degree
                   and not (self._has_ref_out_edge(w) or w.out_degree != 1)):
                (nxt, edge) = next(iter(w.out_edges.items()))
                if edge.multiplicity < PRUNE_FACTOR:
                    path = []
                else:
                    path.append(w)
                w = nxt
                if id(w) in visited:
                    ok = False
                    break
                visited.add(id(w))
            if w is not None:
                path.append(w)
            if not ok or not self._has_ref_out_edge(w):
                continue
            if len(path) < self.MIN_DANGLING_BRANCH_LENGTH + 1:
                continue
            hcd = path[-1]
            if hcd is self.ref_sink:
                continue
            alt_path = list(reversed(path))       # [HCD, ..., head]
            ref_path = self._reference_path_from(hcd, forward=False)
            if len(ref_path) < 2:
                continue
            # reversed-orientation bases walking outward from the HCD; the
            # in-degree-0 endpoint contributes its whole kmer reversed
            # (GATK getBasesForPath(expandSource=true))
            alt_seq = b"".join(
                v.kmer[::-1] if v.in_degree == 0 else v.kmer[-1:]
                for v in alt_path)
            ref_seq = b"".join(
                v.kmer[::-1] if v.in_degree == 0 else v.kmer[-1:]
                for v in ref_path)
            try:
                res = sw_align(ref_seq, alt_seq, DANGLING_END_PARAMS,
                               OverhangStrategy.LEADING_INDEL)
            except ValueError:
                continue
            elems = list(res.cigar.elements)
            if not elems or len(elems) > self.MAX_CIGAR_COMPLEXITY \
                    or elems[0][0] != CigarOp.M:
                continue
            max_index = min(elems[0][1], len(ref_seq), len(alt_seq))
            max_mismatches = max(1, len(path) // self.k)
            mismatches = 0
            last_good = -1
            for idx in range(max_index):
                if ref_seq[idx] != alt_seq[idx]:
                    mismatches += 1
                    if mismatches > max_mismatches:
                        last_good = -1
                        break
                    last_good = idx
            indexes_to_merge = last_good
            if indexes_to_merge <= 0:
                continue
            if indexes_to_merge >= len(ref_path) - 1:
                continue
            if indexes_to_merge >= len(alt_path):
                alt_path = self._extend_dangling_path(
                    alt_path, ref_path, res.cigar,
                    indexes_to_merge - len(alt_path) + 2)
                if alt_path is None:
                    continue
            from_v = ref_path[indexes_to_merge + 1]
            to_v = alt_path[indexes_to_merge]
            if to_v not in from_v.out_edges:
                e = Edge(1, False)
                from_v.out_edges[to_v] = e
                to_v.in_edges[from_v] = e
                recovered += 1
        return recovered

    def _extend_dangling_path(self, alt_path, ref_path, cigar, n_extend):
        """Extend a dangling head path upstream with reference bases
        (extend_dangling_path_against_reference,
        hc_assemble_base_graph.c:757-813)."""
        from ..reads.cigar import CigarOp

        ref_len = sum(n for op, n in cigar
                      if op in (CigarOp.M, CigarOp.D))
        read_len = sum(n for op, n in cigar
                       if op in (CigarOp.M, CigarOp.I))
        offset = ref_len - read_len
        index_of_ref_node = len(alt_path) - 1 + offset + n_extend
        if not (0 <= index_of_ref_node < len(ref_path)):
            return None

        dangling_source = alt_path[-1]
        alt_path = alt_path[:-1]
        ref_v = ref_path[index_of_ref_node]
        seq = ref_v.kmer[:n_extend] + dangling_source.kmer

        # drop the old source and its edge; rebuild extended chain
        out_items = list(dangling_source.out_edges.items())
        if not out_items:
            return None
        prev_v, source_edge = out_items[0]
        weight = source_edge.multiplicity
        del dangling_source.out_edges[prev_v]
        del prev_v.in_edges[dangling_source]

        for i in range(n_extend, 0, -1):
            kmer = seq[i:i + self.k]
            new_v = self._new_vertex(kmer, unique=False)
            e = Edge(weight, False)
            new_v.out_edges[prev_v] = e
            prev_v.in_edges[new_v] = e
            alt_path.append(new_v)
            prev_v = new_v
        return alt_path

    def to_sequence_graph(self):
        """Each vertex contributes its last base; the ref source contributes
        its whole kmer (GATK convertToSequenceGraph)."""
        sg = SeqGraph()
        mapping = {}
        for v in self.vertices:
            seq = v.kmer if v is self.ref_source else v.kmer[-1:]
            mapping[v] = sg.add_vertex(seq)
        for v in self.vertices:
            for w, e in v.out_edges.items():
                sg.add_edge(mapping[v], mapping[w], e.multiplicity, e.is_ref)
        sg.ref_source = mapping.get(self.ref_source)
        sg.ref_sink = mapping.get(self.ref_sink)
        return sg


class SeqVertex:
    __slots__ = ("seq", "uid", "in_edges", "out_edges")

    def __init__(self, seq, uid):
        self.seq = seq
        self.uid = uid
        self.in_edges = {}
        self.out_edges = {}

    @property
    def in_degree(self):
        return len(self.in_edges)

    @property
    def out_degree(self):
        return len(self.out_edges)

    def __repr__(self):
        return f"S({self.seq.decode()}#{self.uid})"


class SeqGraph:
    def __init__(self):
        self.vertices = []
        self.ref_source = None
        self.ref_sink = None
        self._uid = itertools.count()

    def add_vertex(self, seq):
        v = SeqVertex(seq, next(self._uid))
        self.vertices.append(v)
        return v

    def add_edge(self, u, v, multiplicity=1, is_ref=False):
        e = u.out_edges.get(v)
        if e is None:
            e = Edge(0, False)
            u.out_edges[v] = e
            v.in_edges[u] = e
        e.multiplicity += multiplicity
        e.is_ref |= is_ref
        return e

    def remove_vertices(self, dead):
        dead = set(dead)
        for v in dead:
            for u in list(v.in_edges):
                u.out_edges.pop(v, None)
            for w in list(v.out_edges):
                w.in_edges.pop(v, None)
        self.vertices = [v for v in self.vertices if v not in dead]

    def zip_linear_chains(self):
        """Merge chains of in==1/out==1 vertices into single vertices
        (hc_assemble_seq_graph_zip_linear_chains)."""
        changed = True
        while changed:
            changed = False
            alive = set(self.vertices)
            for v in list(self.vertices):
                if v not in alive:
                    continue
                if not (v.in_degree == 1 and v.out_degree == 1):
                    continue
                (u, _e_in) = next(iter(v.in_edges.items()))
                if u is v or u.out_degree != 1:
                    continue
                (w, e_out) = next(iter(v.out_edges.items()))
                if w is v:
                    continue
                # merge v into u
                u.seq = u.seq + v.seq
                del u.out_edges[v]
                del v.in_edges[u]
                del v.out_edges[w]
                del w.in_edges[v]
                self.add_edge(u, w, e_out.multiplicity, e_out.is_ref)
                self.vertices.remove(v)
                alive.discard(v)
                if v is self.ref_sink:
                    self.ref_sink = u
                if v is self.ref_source:
                    self.ref_source = u
                changed = True

    def remove_singleton_orphans(self):
        dead = [v for v in self.vertices
                if v.in_degree == 0 and v.out_degree == 0
                and v is not self.ref_source]
        if dead:
            self.remove_vertices(dead)

    # --- simplification (hc_assemble_seq_graph.c /
    #     hc_assemble_vertex_sequence_spliter.c; GATK CommonSuffixSplitter,
    #     SharedSequenceMerger, MergeDiamonds-equivalent) ---
    def split_common_suffixes(self):
        """For a vertex with >=2 incoming vertices sharing a common suffix,
        hoist the suffix into a new vertex between them (this also covers
        diamond merging: the diamond bottom is exactly such a vertex)."""
        changed = False
        for v in list(self.vertices):
            if v.in_degree < 2:
                continue
            prevs = list(v.in_edges.keys())
            if any(p is v or p.out_degree != 1 for p in prevs):
                continue
            # common suffix
            suffix_len = min(len(p.seq) for p in prevs)
            suffix = b""
            for k in range(1, suffix_len + 1):
                ch = prevs[0].seq[-k:]
                if all(p.seq[-k:] == ch for p in prevs):
                    suffix = ch
                else:
                    break
            if not suffix:
                continue
            if all(p.seq == suffix for p in prevs):
                continue  # identical vertices: SharedSequenceMerger's job
            if any(len(p.seq) == len(suffix) and p.in_degree == 0
                   for p in prevs):
                continue  # would empty a source vertex
            s = self.add_vertex(suffix)
            total_mult = 0
            any_ref = False
            for p in prevs:
                e = p.out_edges.pop(v)
                v.in_edges.pop(p)
                total_mult += e.multiplicity
                any_ref |= e.is_ref
                p.seq = p.seq[:-len(suffix)]
                if p.seq:
                    self.add_edge(p, s, e.multiplicity, e.is_ref)
                else:
                    # vertex emptied: reattach its parents directly to s
                    for q, e2 in list(p.in_edges.items()):
                        q.out_edges.pop(p)
                        self.add_edge(q, s, e2.multiplicity, e2.is_ref)
                    p.in_edges.clear()
                    self.vertices.remove(p)
                    if p is self.ref_source:
                        self.ref_source = s
            self.add_edge(s, v, total_mult, any_ref)
            changed = True
        return changed

    def merge_diamonds(self):
        """Split the common prefix+suffix out of diamond middles
        (hc_assemble_vertex_sequence_spliter.c:75-135, split_and_update
        :803-965): for top->{middles}->bottom where each middle's only
        parent is top and only child is bottom, hoist the shared prefix
        into a vertex after top and the shared suffix into one before
        bottom; middles fully explained by prefix+suffix collapse into a
        direct edge with summed multiplicity."""
        changed = False
        for top in list(self.vertices):
            if top not in self.vertices or top.out_degree < 2:
                continue
            middles = list(top.out_edges.keys())
            bottom = None
            ok = True
            for m in middles:
                if (m.out_degree < 1 or m.in_degree != 1 or m is top
                        or m is self.ref_source or m is self.ref_sink):
                    ok = False
                    break
                for t in m.out_edges:
                    if bottom is None:
                        bottom = t
                    elif t is not bottom:
                        ok = False
                        break
                if not ok:
                    break
            if (not ok or bottom is None or bottom is top
                    or bottom in middles
                    or bottom.in_degree != len(middles)):
                continue
            seqs = [m.seq for m in middles]
            min_len = min(len(s) for s in seqs)
            pre = 0
            while pre < min_len and all(s[pre] == seqs[0][pre]
                                        for s in seqs):
                pre += 1
            suf = 0
            lim = min_len - pre  # suffix bounded after prefix removal
            while suf < lim and all(s[len(s) - 1 - suf]
                                    == seqs[0][len(seqs[0]) - 1 - suf]
                                    for s in seqs):
                suf += 1
            if pre == 0 and suf == 0:
                continue
            prefix_seq = seqs[0][:pre]
            suffix_seq = seqs[0][len(seqs[0]) - suf:] if suf else b""

            entries = []
            for m in middles:
                e_in = m.in_edges[top]
                e_out = m.out_edges[bottom]
                entries.append((m.seq[pre:len(m.seq) - suf], e_in, e_out))
                top.out_edges.pop(m)
                bottom.in_edges.pop(m)
                m.in_edges.clear()
                m.out_edges.clear()
                self.vertices.remove(m)
            prefix_v = self.add_vertex(prefix_seq) if pre else None
            suffix_v = self.add_vertex(suffix_seq) if suf else None
            top_c = prefix_v if prefix_v is not None else top
            bot_c = suffix_v if suffix_v is not None else bottom
            direct_w = 0
            direct_ref = False
            for rem, e_in, e_out in entries:
                if rem:
                    mv = self.add_vertex(rem)
                    self.add_edge(top_c, mv, e_in.multiplicity, e_in.is_ref)
                    self.add_edge(mv, bot_c, e_out.multiplicity,
                                  e_out.is_ref)
                else:
                    # prefix + suffix fully explain this middle
                    direct_w += e_in.multiplicity + e_out.multiplicity
                    direct_ref |= e_in.is_ref or e_out.is_ref
            if direct_w:
                existing = top_c.out_edges.get(bot_c)
                if existing is None:
                    self.add_edge(top_c, bot_c, direct_w, direct_ref)
                else:
                    existing.multiplicity += direct_w
                    existing.is_ref |= direct_ref
            # splice edges carry multiplicity 1, is_ref ORed over the side
            # they replace (add_prefix/suffix_node_and_edges :940-992)
            if prefix_v is not None:
                is_ref = any(e.is_ref for e in prefix_v.out_edges.values())
                self.add_edge(top, prefix_v, 1, is_ref)
            if suffix_v is not None:
                is_ref = any(e.is_ref for e in suffix_v.in_edges.values())
                self.add_edge(suffix_v, bottom, 1, is_ref)
            changed = True
        return changed

    def merge_identical_incoming(self):
        """Merge incoming vertices with identical sequence and identical
        sole target (SharedSequenceMerger)."""
        changed = False
        for v in list(self.vertices):
            if v.in_degree < 2:
                continue
            by_seq = {}
            for p in v.in_edges:
                if p.out_degree == 1 and p is not v:
                    by_seq.setdefault(p.seq, []).append(p)
            for seq, group in by_seq.items():
                if len(group) < 2:
                    continue
                keep = group[0]
                for p in group[1:]:
                    e = p.out_edges.pop(v)
                    v.in_edges.pop(p)
                    ke = keep.out_edges.get(v)
                    if ke is None:
                        self.add_edge(keep, v, e.multiplicity, e.is_ref)
                    else:
                        ke.multiplicity += e.multiplicity
                        ke.is_ref |= e.is_ref
                    for q, e2 in list(p.in_edges.items()):
                        q.out_edges.pop(p)
                        self.add_edge(q, keep, e2.multiplicity, e2.is_ref)
                    p.in_edges.clear()
                    self.vertices.remove(p)
                    if p is self.ref_source:
                        self.ref_source = keep
                    if p is self.ref_sink:
                        self.ref_sink = keep
                changed = True
        return changed

    def simplify(self, max_iterations=6):
        """Iterate zip + suffix split + identical merge to a fixed point
        (hc_assemble_seq_graph_simplify_graph)."""
        for _ in range(max_iterations):
            self.zip_linear_chains()
            changed = self.merge_diamonds()
            changed |= self.split_common_suffixes()
            changed |= self.merge_identical_incoming()
            if not changed:
                break
        self.zip_linear_chains()

    def remove_vertices_not_connected_to_ref_undirected(self):
        if self.ref_source is None:
            return
        seen = set()
        stack = [self.ref_source]
        while stack:
            v = stack.pop()
            if v in seen:
                continue
            seen.add(v)
            stack.extend(n for n in v.in_edges if n not in seen)
            stack.extend(n for n in v.out_edges if n not in seen)
        self.remove_vertices([v for v in self.vertices if v not in seen])


def find_k_best_haplotypes(graph, max_haplotypes=MAX_HAPLOTYPES):
    """K-best source->sink paths by log10 edge-frequency score
    (hc_assemble_dijkstra_find_best_haplotypes; GATK
    GraphBasedKBestHaplotypeFinder). Returns [(seq_bytes, score, is_ref)]
    sorted best-first."""
    source, sink = graph.ref_source, graph.ref_sink
    if source is None or sink is None:
        return []

    results = []
    visit_count = {}
    # tie-break on equal score matches the reference's rbtree comparator
    # (hc_assemble_dijkstra_compare_edge_path): lexicographically LARGER
    # partial sequence pops first, and on a shared prefix the LONGER path
    # wins. Encode that as ascending order of the byte-inverted sequence
    # plus a 0xFF sentinel (greater than any inverted base, so a prefix
    # sorts after its extensions).
    def invkey(seq):
        return bytes(255 - b for b in seq) + b"\xff"

    counter = itertools.count(0, -1)  # LIFO among exactly-equal keys: the
    # reference's rbtree inserts equal-comparing nodes to the LEFT
    # (hc_assemble_dijkstra_shortest_path.c:398-403), so the newest of an
    # exactly-tied pair pops first
    # heap entries: (-score, invkey(seq), tiebreak, seq, vertex, is_ref_path)
    heap = [(0.0, invkey(source.seq), next(counter), source.seq, source,
             True)]
    while heap and len(results) <= max_haplotypes:
        neg_score, _, _, seq, v, is_ref = heapq.heappop(heap)
        if v is sink:
            results.append((seq, -neg_score, is_ref))
            continue
        visits = visit_count.get(v, 0)
        if visits + 1 >= max_haplotypes:
            continue
        visit_count[v] = visits + 1
        total_out = sum(e.multiplicity for e in v.out_edges.values())
        if total_out == 0:
            continue
        for w, e in v.out_edges.items():
            penalty = (math.log10(e.multiplicity) - math.log10(total_out))
            nseq = seq + w.seq
            heapq.heappush(heap, (neg_score - penalty, invkey(nseq),
                                  next(counter), nseq, w,
                                  is_ref and e.is_ref))
    return results
