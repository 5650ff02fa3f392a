"""Canonical claim schema: the reference's 54-field contract
(reference core/config.py:12-112) with ASCII canonical names and the
Korean source-column alias map.

Ingestion is schema-on-write tolerant: every field lands as STRING at
the canonical layer (the reference ingests all-object pandas columns);
typed derivations (dates, lag, partition ints) are added by
etl.preprocess. The arity assert mirrors core/config.py:112.
"""

from __future__ import annotations

from pyspark.sql.types import StringType, StructField, StructType

# (ascii_name, korean_alias) in the reference's declaration order
CANONICAL_FIELDS: list[tuple[str, str]] = [
    # reception info
    ("reception_year", "접수년"),
    ("reception_month", "접수월"),
    ("reception_day", "접수일"),
    ("reception_channel", "접수경로"),
    # business info
    ("business_unit", "사업부문"),
    ("claim_id", "상담번호"),
    # product info
    ("product_name", "제품명"),
    ("product_code", "제품코드"),
    ("product_group", "제품군"),
    ("product_category1", "제품범주1"),
    ("product_category2", "제품범주2"),
    ("product_category3", "제품범주3"),
    ("product_division1", "제품구분1"),
    ("product_division2", "제품구분2"),
    # claim content
    ("title", "제목"),
    ("demand", "요구사항"),
    ("analysis_result", "분석결과"),
    ("grade", "등급기준"),
    ("complaint_cause", "불만원인"),
    # classification
    ("major_category", "대분류"),
    ("middle_category", "중분류"),
    ("minor_category", "소분류"),
    # expiry dates
    ("expiry_date", "유통기한"),
    ("expiry_year", "유통기한-년"),
    ("expiry_month", "유통기한-월"),
    ("expiry_day", "유통기한-일"),
    # manufacture dates
    ("manufacture_date", "제조일자"),
    ("manufacture_year", "제조-년"),
    ("manufacture_month", "제조-월"),
    ("manufacture_day", "제조-일"),
    # purchase info
    ("purchase_date", "구입일자"),
    ("purchase_channel", "구입경로"),
    ("purchase_store", "구입처"),
    ("plant", "플랜트"),
    # handling info
    ("handling_dept", "개선부서명"),
    ("handling_method", "조치방법"),
    ("visit_date", "방문일자"),
    # customer info
    ("address1", "주소1"),
    ("gender", "성별"),
    ("age", "연령"),
    # money
    ("total_cost", "총처리액"),
    ("compensation", "보상액"),
    ("shipping_cost", "택배비용"),
    ("compensation_self", "보상액(자소)"),
    ("other_cost", "기타비용"),
    # misc
    ("lot", "LOT"),
    ("foreign_report_target", "이물신고대상"),
    ("report_date", "신고일자"),
    ("admin_action", "행정처분"),
    ("incident_date", "발생일자"),
    ("human_harm", "인체피해"),
    ("critical_share", "중대보고공유"),
    ("rapid_share", "신속공유"),
    ("foreign_report_check", "이물신고체크"),
]

CANONICAL_COLS: list[str] = [name for name, _ in CANONICAL_FIELDS]
KOREAN_TO_ASCII: dict[str, str] = {kr: en for en, kr in CANONICAL_FIELDS}

CANONICAL_SCHEMA = StructType(
    [StructField(name, StringType(), True) for name in CANONICAL_COLS]
)

# partition columns for the hub layout (reference core/config.py:100)
PARTITION_COLS = ("reception_year", "reception_month")

# reference core/config.py:112
assert len(CANONICAL_COLS) == 54, f"field count error: {len(CANONICAL_COLS)} (54 required)"
assert len(set(CANONICAL_COLS)) == 54
