"""Document-level post passes: line-number side vote and revision
inference.

Behavioral spec re-derived from the reference's Parser.php:
``parse_lineNumbers`` (:193-237) — majority vote per JSON type on
which side line numbers live, stripping numberObjects as it counts;
``parse_revisions`` (:239-486) — key-page detection (pages whose
non-special colors all map to one name), weight list manipulation
(insert-before semantics of SplDoublyLinkedList::add), weight
reversal, and per-object color-range → revision-weight conversion.
"""

from __future__ import annotations

from typing import Dict, List, Optional

from .colors_list import ColorsList
from .objects import ScriptObject


def parse_line_numbers(objects: List[ScriptObject]) -> Dict[str, Dict[str, int]]:
    counts: Dict[str, Dict[str, int]] = {}
    for obj in objects:
        t = obj.get_type_json()
        entry = counts.setdefault(t, {"count": 0, "left": 0, "right": 0})
        entry["count"] += 1
        num_obj = obj.attributes.get("numberObject") or {}
        if num_obj.get("left"):
            entry["left"] += 1
            num_obj.pop("left", None)
        if num_obj.get("right"):
            entry["right"] += 1
            num_obj.pop("right", None)
    out: Dict[str, Dict[str, int]] = {}
    for line_type, c in counts.items():
        half = c["count"] // 2
        lr: Dict[str, int] = {}
        if half < c["left"]:
            lr["left"] = 1
        if half < c["right"]:
            lr["right"] = 1
        if lr:
            out[line_type] = lr
    return out


def parse_revisions(objects: List[ScriptObject],
                    colors: Optional[ColorsList]) -> List[Dict]:
    if colors is None or not objects:
        return []

    # --- which objects are on each internal page -----------------
    objs_on_page: List[Dict[str, int]] = []
    colors_on_page: List[Dict[int, int]] = []
    last_page_num = None
    for key, obj in enumerate(objects):
        if last_page_num is None or obj.page_num != last_page_num:
            if objs_on_page:
                objs_on_page[-1]["last"] = key - 1
            objs_on_page.append({"first": key, "last": len(objects) - 1})
            colors_on_page.append({})
            last_page_num = obj.page_num
        for color_id in obj.get_color_ids():
            page_colors = colors_on_page[-1]
            page_colors[color_id] = page_colors.get(color_id, 0) + 1
    if objs_on_page:
        objs_on_page[-1]["last"] = len(objects) - 1

    key_pairs = colors.get_key_pairs()
    revisions: List[Dict] = []
    revisions_on_page: Dict[int, List[Dict]] = {}
    weights: List[Dict] = []  # index = weight position

    # --- key pages (single known color+name) ---------------------
    for p_num in key_pairs:
        attrs = key_pairs[p_num]
        found = any(attrs["COLOR"] == r["COLOR"] and attrs["NAME"] == r["NAME"]
                    for r in revisions)
        if not found:
            revisions.append({"NAME": attrs["NAME"], "COLOR": attrs["COLOR"],
                              "COLORS_LIST_ID": attrs["COLORS_LIST_ID"],
                              "REV_ID": len(revisions)})
            newest = revisions[-1]["REV_ID"]
            weights.append({"revision": newest, "isKey": 1,
                            "pageFoundOn": p_num})
            revisions_on_page.setdefault(p_num, []).append(revisions[newest])

    # --- second pass over all pages ------------------------------
    for p_num, page_colors in enumerate(colors_on_page):
        highest_weight: Optional[int] = None
        second_highest: Optional[int] = None
        found_existing = False
        handled: Dict[int, int] = {}
        mystery_key: Optional[int] = None

        def color_been_found(color_id: int) -> bool:
            if color_id in handled:
                handled[color_id] += 1
                return True
            handled[color_id] = 1
            return False

        header_name = None
        done = False
        for color_id in page_colors:
            header_name = colors.get_header_name_by_page_num(p_num)
            for w_idx, w in enumerate(weights):
                rev = revisions[w["revision"]]
                if (rev["NAME"] == header_name
                        and rev["COLORS_LIST_ID"] == color_id):
                    highest_weight = w_idx
                    if w["pageFoundOn"] != p_num:
                        revisions_on_page.setdefault(p_num, []).append(rev)
                    found_existing = True
                    color_been_found(rev["COLORS_LIST_ID"])
                    done = True
                    break
            if done:
                break
        if not found_existing and len(page_colors) > 0:
            if header_name is None and page_colors:
                header_name = colors.get_header_name_by_page_num(p_num)
            revisions.append({"NAME": header_name, "COLOR": "UNKNOWN",
                              "COLORS_LIST_ID": -1,
                              "REV_ID": len(revisions)})
            newest = revisions[-1]["REV_ID"]
            weights.append({"revision": newest, "isKey": 0,
                            "pageFoundOn": p_num})
            revisions_on_page.setdefault(p_num, []).append(revisions[newest])
            highest_weight = len(weights) - 1
            mystery_key = newest

        for color_id in page_colors:
            for w_idx, w in enumerate(weights):
                rev = revisions[w["revision"]]
                if rev["COLORS_LIST_ID"] == color_id:
                    if not color_been_found(color_id):
                        revisions_on_page.setdefault(p_num, []).append(rev)
                        if second_highest is None:
                            second_highest = w_idx
                        elif w_idx < second_highest:
                            second_highest = w_idx
        if highest_weight is not None and second_highest is not None:
            hold = weights[highest_weight]
            del weights[highest_weight]
            # SplDoublyLinkedList::add inserts BEFORE the index
            weights.insert(second_highest, hold)

        for color_id in page_colors:
            if not color_been_found(color_id):
                color_hex = colors.get_color_hex_code(color_id)
                if mystery_key is not None:
                    revisions[mystery_key]["COLOR"] = color_hex
                    revisions[mystery_key]["COLORS_LIST_ID"] = color_id
                    mystery_key = None
                else:
                    revisions.append({"NAME": "UNKNOWN", "COLOR": color_hex,
                                      "COLORS_LIST_ID": color_id,
                                      "REV_ID": len(revisions)})
                    newest = revisions[-1]["REV_ID"]
                    weights.append({"revision": newest, "isKey": 0,
                                    "pageFoundOn": p_num})
                    revisions_on_page.setdefault(p_num, []).append(
                        revisions[newest])

    # --- reverse weights -----------------------------------------
    revisions_by_weight: Dict[int, Dict] = {}
    for w_idx, w in enumerate(weights):
        reversed_weight = len(revisions) - w_idx - 1
        revisions[w["revision"]]["WEIGHT"] = reversed_weight
        revisions_by_weight[reversed_weight] = revisions[w["revision"]]

    # --- page/color → weight, then object ranges → revisions -----
    page_num_table: Dict[int, int] = {}
    for i, rng in enumerate(objs_on_page):
        for j in range(rng["first"], rng["last"] + 1):
            page_num_table[j] = i

    page_color_to_rev: Dict[int, Dict[int, int]] = {}
    for p_num, revs in revisions_on_page.items():
        for rev in revs:
            updated_id = revisions[rev["REV_ID"]]["COLORS_LIST_ID"]
            page_color_to_rev.setdefault(p_num, {})[updated_id] = \
                revisions[rev["REV_ID"]].get("WEIGHT", 0)

    for o_num, o in enumerate(objects):
        for color_id, instances in o.colors.items():
            for inst in instances:
                if inst["start"] == inst["end"]:
                    continue
                obj_page = page_num_table.get(o_num, 0)
                weight_num = page_color_to_rev.get(obj_page, {}).get(color_id)
                if weight_num is not None:
                    o.add_revision(weight_num, inst)

    out: List[Dict] = []
    for w in sorted(revisions_by_weight):
        rev = revisions_by_weight[w]
        name = rev["NAME"] if rev["NAME"] else "UNKNOWN"
        out.append({"name": name, "color": rev["COLOR"]})
    return out
