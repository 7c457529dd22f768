"""Streaming FP-growth (exact + false-negative inserts, decay,
restructure, conditional-tree mining).

Port of the reference's MacroBase-lineage streaming FP-tree:
- facade: utils/itemset/FPTree/StreamingFPGrowth.scala:13-90
- tree:   utils/itemset/FPTree/StreamingFPTree.scala:11-523
- node:   utils/itemset/FPTree/FPTreeNode.scala:12-240

Determinism notes (SURVEY.md §7.4.6): where the reference iterates JVM
HashMap/HashSet entry sets (arbitrary order), this port iterates dicts
in insertion order and iterates input item-sets in sorted order, which
is deterministic run-to-run; golden counts from the reference's own
tests (7/6 itemsets, FP-paper 625/797 — StreamingFPGrowthTest.scala)
are order-insensitive and reproduced in tests/test_algorithms.py
(test_fp_from_paper, the 625/797 block at :203).

Quirk kept: `decayAndResetFrequentItems` assigns the *same* counts map
object into the tree (StreamingFPGrowth.scala:57), and the summarizer
passes one `interestingItems` map to both the outlier and inlier trees
— so between update periods the two trees share and co-mutate one
counts dict. Reproduced by assigning the dict by reference.
"""

from __future__ import annotations

from itertools import combinations
from typing import Iterable

from .models import ItemsetWithCount


class FPTreeNode:
    __slots__ = ("item", "parent", "count", "tree", "next_link", "prev_link", "children")

    def __init__(self, item: int, parent: "FPTreeNode | None", count: float, tree: "StreamingFPTree") -> None:
        self.item = item
        self.parent = parent
        self.count = count
        self.tree = tree
        self.next_link: FPTreeNode | None = None
        self.prev_link: FPTreeNode | None = None
        self.children: list[FPTreeNode] | None = None

    def has_children(self) -> bool:
        return bool(self.children)

    def remove_child(self, child: "FPTreeNode") -> None:
        assert child in self.children
        self.children.remove(child)

    def merge_children(self, other_children: "list[FPTreeNode] | None") -> None:
        # FPTreeNode.scala:118-160
        assert not self.has_children() or self.tree._not_leaf(self)
        if other_children is None:
            return
        if self.children is None:
            self.children = list(other_children)
            for child in other_children:
                child.parent = self
            self.tree._leaf_discard(self)
            return
        ours_by_item = {c.item: c for c in self.children}
        for other in other_children:
            other.parent = self
            ours = ours_by_item.get(other.item)
            if ours is not None:
                self.tree.remove_node_from_headers(other)
                ours.count += other.count
                ours.merge_children(other.children)
            else:
                self.children.append(other)
                ours_by_item[other.item] = other

    def insert_transaction(
        self, txn: list[int], item_count: float, index: int, streaming: bool
    ) -> None:
        # FPTreeNode.scala:170-240
        tree = self.tree
        if not streaming:
            tree._sorted_add(self)
        self.count += item_count
        if index == len(txn):
            return
        current_item = txn[index]
        matching_child = None
        if self.children is not None:
            for child in self.children:
                if child.item == current_item:
                    matching_child = child
                    break
        if matching_child is None:
            matching_child = FPTreeNode(current_item, self, 0, tree)
            if not streaming:
                tree._sorted_add(matching_child)
            prev_header = tree.node_headers.get(current_item)
            tree.node_headers[current_item] = matching_child
            if prev_header is not None:
                matching_child.next_link = prev_header
                prev_header.prev_link = matching_child
            if self.children is None:
                self.children = []
            self.children.append(matching_child)
            if index == len(txn) - 1:
                tree._leaf_add(matching_child)
            tree._leaf_discard(self)
        matching_child.insert_transaction(txn, item_count, index + 1, streaming)


class StreamingFPTree:
    def __init__(self) -> None:
        self.root = FPTreeNode(-1, None, 0, self)
        self.frequent_item_counts: dict[int, float] = {}
        self.frequent_item_order: dict[int, int] = {}
        self.node_headers: dict[int, FPTreeNode] = {}
        # ordered sets of nodes, keyed by id() for hashability with
        # deterministic insertion-order iteration
        self._leaf_nodes: dict[int, FPTreeNode] = {}
        self._sorted_nodes: dict[int, FPTreeNode] = {}

    def __getstate__(self) -> dict:
        # id()-keyed dicts are meaningless after unpickling (object
        # ids change), which silently corrupts the leaf/sorted
        # membership checks and crashes sort_by_new_order on the first
        # post-resume restructure (found by the r5 MacroBase resume
        # soak). Serialize the ordered sets as node-reference LISTS
        # (pickle's memo keeps them identical to the tree's own
        # nodes) and re-key on load.
        state = self.__dict__.copy()
        state["_leaf_nodes"] = list(self._leaf_nodes.values())
        state["_sorted_nodes"] = list(self._sorted_nodes.values())
        return state

    def __setstate__(self, state: dict) -> None:
        leaves = state.pop("_leaf_nodes")
        sorted_nodes = state.pop("_sorted_nodes")
        self.__dict__.update(state)
        self._leaf_nodes = {id(n): n for n in leaves}
        self._sorted_nodes = {id(n): n for n in sorted_nodes}

    # --- ordered-set helpers -------------------------------------------------
    def _leaf_add(self, node: FPTreeNode) -> None:
        self._leaf_nodes[id(node)] = node

    def _leaf_discard(self, node: FPTreeNode) -> None:
        self._leaf_nodes.pop(id(node), None)

    def _not_leaf(self, node: FPTreeNode) -> bool:
        return id(node) not in self._leaf_nodes

    def _sorted_add(self, node: FPTreeNode) -> None:
        self._sorted_nodes[id(node)] = node

    def _is_sorted(self, node: FPTreeNode) -> bool:
        return id(node) in self._sorted_nodes

    # --- decay ---------------------------------------------------------------
    def decay_weights(self, start: FPTreeNode, decay_weight: float) -> None:
        # StreamingFPTree.scala:79-96
        if start is self.root:
            for item in self.frequent_item_counts:
                self.frequent_item_counts[item] *= decay_weight
        start.count *= decay_weight
        if start.children is not None:
            for child in list(start.children):
                self.decay_weights(child, decay_weight)

    # --- support query -------------------------------------------------------
    def get_support(self, pattern: Iterable[int]) -> int:
        # StreamingFPTree.scala:98-127; integer truncation of per-path
        # counts (`pathHead.count.toInt`) kept
        pattern = list(pattern)
        counts = self.frequent_item_counts
        for i in pattern:
            if i not in counts:
                return 0
        order = self.frequent_item_order
        plist = sorted(pattern, key=order.__getitem__)
        pattern_set = frozenset(pattern)
        n_pattern = len(plist)
        count = 0
        path_head = self.node_headers.get(plist[0])
        # hot loop: localized attribute access, no helper calls
        while path_head is not None:
            cur = path_head
            items_to_find = n_pattern
            while cur is not None:
                if cur.item in pattern_set:
                    items_to_find -= 1
                    if items_to_find == 0:
                        count += int(path_head.count)
                        break
                cur = cur.parent
            path_head = path_head.next_link
        return count

    # --- frequent-item bookkeeping -------------------------------------------
    def insert_frequent_items(
        self, transactions: list[Iterable[int]], count_required: int
    ) -> None:
        # StreamingFPTree.scala:129-172: canonical (count, key) order so
        # ties are consistent during transaction insertion
        item_counts: dict[int, float] = {}
        for t in transactions:
            for item in sorted(t):
                item_counts[item] = item_counts.get(item, 0.0) + 1.0
        for item, cnt in item_counts.items():
            if cnt >= count_required:
                self.frequent_item_counts[item] = cnt
        ordered = sorted(self.frequent_item_counts.items(), key=lambda kv: (kv[1], kv[0]))
        for i, (item, _) in enumerate(ordered):
            self.frequent_item_order[item] = i

    def delete_items(self, items_to_delete: Iterable[int] | None) -> None:
        # StreamingFPTree.scala:174-197
        if items_to_delete is None:
            return
        for item in sorted(items_to_delete):
            self.frequent_item_order.pop(item, None)
            node = self.node_headers.get(item)
            while node is not None:
                node.parent.remove_child(node)
                if node.has_children():
                    node.parent.merge_children(node.children)
                self._leaf_discard(node)
                node = node.next_link
            self.node_headers.pop(item, None)

    def update_frequent_item_order(self) -> None:
        # StreamingFPTree.scala:199-217: sort by count only (stable in
        # map insertion order for ties)
        self._sorted_nodes.clear()
        self.frequent_item_order.clear()
        ordered = sorted(self.frequent_item_counts.items(), key=lambda kv: kv[1])
        for i, (item, _) in enumerate(ordered):
            self.frequent_item_order[item] = i

    def insert_conditional_frequent_items(
        self, patterns: list[ItemsetWithCount], count_required: int
    ) -> None:
        # StreamingFPTree.scala:219-237
        item_counts: dict[int, float] = {}
        for iwc in patterns:
            for item in sorted(iwc.items):
                item_counts[item] = item_counts.get(item, 0.0) + iwc.count
        for item, cnt in item_counts.items():
            if cnt >= count_required:
                self.frequent_item_counts[item] = cnt
        self.update_frequent_item_order()

    # --- transaction insertion ------------------------------------------------
    def sort_transaction(self, txn: list[int], streaming: bool) -> list[int]:
        # StreamingFPTree.scala:239-251; streaming inserts order -item
        # for unseen items (computeIfAbsent(i, k => -1 * k))
        if not streaming:
            txn.sort(key=lambda i: self.frequent_item_order[i], reverse=True)
        else:
            for i in txn:
                self.frequent_item_order.setdefault(i, -i)
            txn.sort(key=lambda i: self.frequent_item_order[i], reverse=True)
        return txn

    def reinsert_branch(
        self, pattern: Iterable[int], count: float, root_of_branch: FPTreeNode
    ) -> None:
        # StreamingFPTree.scala:253-262
        filtered = [i for i in sorted(pattern) if i in self.frequent_item_counts]
        self.sort_transaction(filtered, streaming=False)
        root_of_branch.insert_transaction(filtered, count, 0, streaming=False)

    def insert_conditional_frequent_patterns(self, patterns: list[ItemsetWithCount]) -> None:
        for iwc in patterns:
            self.reinsert_branch(iwc.items, iwc.count, self.root)

    def insert_transactions(
        self, transactions: list[Iterable[int]], streaming: bool, filter_existing: bool
    ) -> None:
        for t in transactions:
            self.insert_transaction(t, streaming, filter_existing)

    def insert_transaction(
        self, transaction: Iterable[int], streaming: bool, filter_existing: bool
    ) -> None:
        # StreamingFPTree.scala:272-301
        transaction = sorted(set(transaction))
        if streaming and not filter_existing:
            for item in transaction:
                self.frequent_item_counts[item] = self.frequent_item_counts.get(item, 0.0) + 1.0
        filtered = [i for i in transaction if i in self.frequent_item_counts]
        if filtered:
            if streaming and filter_existing:
                for item in filtered:
                    self.frequent_item_counts[item] = self.frequent_item_counts.get(item, 0.0) + 1.0
            self.sort_transaction(filtered, streaming)
            self.root.insert_transaction(filtered, 1.0, 0, streaming)

    def remove_node_from_headers(self, node: FPTreeNode) -> None:
        # StreamingFPTree.scala:303-318
        self._leaf_discard(node)
        if node.prev_link is None:
            assert self.node_headers.get(node.item) is node
            # a None header entry is kept (not deleted) — the reference
            # stores a null value, and mineItemsets still emits the
            # singleton for such keys
            self.node_headers[node.item] = node.next_link
        else:
            node.prev_link.next_link = node.next_link
        if node.next_link is not None:
            node.next_link.prev_link = node.prev_link

    # --- mining ----------------------------------------------------------------
    def mine_itemsets(self, support_count_required: int) -> list[ItemsetWithCount]:
        # StreamingFPTree.scala:320-460
        single_path_itemsets: list[ItemsetWithCount] = []
        branching_itemsets: list[ItemsetWithCount] = []

        cur = self.root
        node_of_branching: FPTreeNode | None = None
        single_path_nodes: list[FPTreeNode] = []
        while True:
            if cur.count < support_count_required:
                break
            if cur.children is not None and len(cur.children) > 1:
                node_of_branching = cur
                break
            if cur is not self.root:
                single_path_nodes.append(cur)
            if not cur.children:
                break
            cur = cur.children[0]

        for r in range(1, len(single_path_nodes) + 1):
            for subset in combinations(single_path_nodes, r):
                items = frozenset(n.item for n in subset)
                min_support = min(n.count for n in subset)
                assert min_support >= support_count_required
                single_path_itemsets.append(ItemsetWithCount(items, min_support))

        if node_of_branching is None:
            return single_path_itemsets

        already_mined = {n.item for n in single_path_nodes}

        for item, header_node in list(self.node_headers.items()):
            if (
                item in already_mined
                or self.frequent_item_counts.get(item, 0.0) < support_count_required
            ):
                continue
            branching_itemsets.append(
                ItemsetWithCount(frozenset([item]), self.frequent_item_counts[item])
            )

            conditional_pattern_base: list[ItemsetWithCount] = []
            conditional_node = header_node
            while conditional_node is not None:
                leaf_support = conditional_node.count
                pattern: set[int] = set()
                walk = conditional_node.parent
                while walk is not node_of_branching.parent and walk is not self.root:
                    pattern.add(walk.item)
                    walk = walk.parent
                if pattern:
                    conditional_pattern_base.append(
                        ItemsetWithCount(frozenset(pattern), leaf_support)
                    )
                conditional_node = conditional_node.next_link

            if not conditional_pattern_base:
                continue

            conditional_tree = StreamingFPTree()
            conditional_tree.insert_conditional_frequent_items(
                conditional_pattern_base, support_count_required
            )
            conditional_tree.insert_conditional_frequent_patterns(conditional_pattern_base)
            conditional_itemsets = conditional_tree.mine_itemsets(support_count_required)
            for iwc in conditional_itemsets:
                branching_itemsets.append(
                    ItemsetWithCount(iwc.items | {item}, iwc.count)
                )

        if not single_path_itemsets:
            return branching_itemsets

        ret = list(single_path_itemsets) + list(branching_itemsets)
        for i in single_path_itemsets:
            for j in branching_itemsets:
                ret.append(
                    ItemsetWithCount(i.items | j.items, min(i.count, j.count))
                )
        return ret

    def sort_by_new_order(self) -> None:
        # StreamingFPTree.scala:462-523
        leaves_to_inspect: list[FPTreeNode] = list(self._leaf_nodes.values())
        removed: set[int] = set()

        i = 0
        while i < len(leaves_to_inspect):
            leaf = leaves_to_inspect[i]
            i += 1
            if leaf is self.root:
                continue
            if id(leaf) in removed or self._is_sorted(leaf):
                continue
            leaf_count = leaf.count
            to_insert = {leaf.item}
            assert not leaf.has_children()
            self.remove_node_from_headers(leaf)
            removed.add(id(leaf))

            cur_lowest_order = self.frequent_item_order[leaf.item]
            node = leaf.parent
            node.remove_child(leaf)

            while True:
                if node is self.root:
                    break
                node_order = self.frequent_item_order[node.item]
                if self._is_sorted(node) and node_order < cur_lowest_order:
                    break
                elif node_order < cur_lowest_order:
                    cur_lowest_order = node_order
                assert id(node) not in removed
                to_insert.add(node.item)
                node.count -= leaf_count
                if node.count == 0 and not node.has_children():
                    removed.add(id(node))
                    self.remove_node_from_headers(node)
                    node.parent.remove_child(node)
                elif not node.has_children() and not self._is_sorted(node):
                    leaves_to_inspect.append(node)
                node = node.parent

            node.count -= leaf_count
            self.reinsert_branch(to_insert, leaf_count, node)


class StreamingFPGrowth:
    """Facade: StreamingFPGrowth.scala:13-90."""

    def __init__(self, support: float) -> None:
        self.support = support
        self.fp = StreamingFPTree()
        self.needs_restructure = False
        self.started_streaming = False

    def insert_transactions_streaming_exact(self, transactions: list[Iterable[int]]) -> None:
        self.needs_restructure = True
        self.started_streaming = True
        self.fp.insert_transactions(transactions, streaming=True, filter_existing=False)

    def insert_transaction_false_negative(self, transaction: Iterable[int]) -> None:
        self.needs_restructure = True
        self.started_streaming = True
        self.fp.insert_transaction(transaction, streaming=True, filter_existing=True)

    def restructure_tree(self, items_to_delete: Iterable[int] | None) -> None:
        self.needs_restructure = False
        self.fp.delete_items(items_to_delete)
        self.fp.update_frequent_item_order()
        self.fp.sort_by_new_order()

    def build_tree(self, transactions: list[Iterable[int]]) -> None:
        if self.started_streaming:
            raise RuntimeError("Can't build a tree based on an already streaming tree..")
        count_required = int(self.support * len(transactions))
        self.fp.insert_frequent_items(transactions, count_required)
        self.fp.insert_transactions(transactions, streaming=False, filter_existing=False)

    def decay_and_reset_frequent_items(
        self, new_frequent_items: dict[int, float], decay_rate: float
    ) -> None:
        # assigns the dict BY REFERENCE (StreamingFPGrowth.scala:57) —
        # callers passing one map to two trees share it intentionally
        to_remove = set(self.fp.frequent_item_order.keys()) - set(new_frequent_items.keys())
        self.fp.frequent_item_counts = new_frequent_items
        self.fp.update_frequent_item_order()
        if decay_rate > 0:
            self.fp.decay_weights(self.fp.root, 1 - decay_rate)
        self.restructure_tree(to_remove)

    def get_counts(self, targets: list[ItemsetWithCount]) -> list[ItemsetWithCount]:
        if self.needs_restructure:
            self.restructure_tree(None)
        return [
            ItemsetWithCount(t.items, float(self.fp.get_support(t.items))) for t in targets
        ]

    def get_itemsets(self) -> list[ItemsetWithCount]:
        if self.needs_restructure:
            self.restructure_tree(None)
        return self.fp.mine_itemsets(int(self.fp.root.count * self.support))
