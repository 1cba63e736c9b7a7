"""HR-system user sources.

Reference: databuilder/extractor/user/bamboohr/bamboohr_user_extractor.py
— fetches the BambooHR employee-directory XML over basic-auth REST and
yields one User record per ``<employee>`` element, reading each field by
id and defaulting to '' when absent (get_field, :46-52).

Spark shape: the directory fetch is one driver-side call (an HR directory
is thousands of rows, never big data), injected as a callable so tests and
air-gapped runs need no network; parsing lands directly in a DataFrame
that downstream plans (models/misc.expand_users, user search documents)
consume. The transport in production is
``requests.get(url, auth=HTTPBasicAuth(api_key, 'x'))`` (:39-41).
"""

from __future__ import annotations

from typing import Callable
from xml.etree import ElementTree

from pyspark.sql import DataFrame, SparkSession

# field-id -> output column, reference :54-61
BAMBOOHR_FIELDS = {
    "workEmail": "email",
    "firstName": "first_name",
    "lastName": "last_name",
    "displayName": "name",
    "department": "team_name",
    "jobTitle": "role_name",
}

USER_COLUMNS = tuple(BAMBOOHR_FIELDS.values())


def employee_directory_uri(subdomain: str) -> str:
    """reference :35-36."""
    return (f"https://api.bamboohr.com/api/gateway.php/{subdomain}"
            "/v1/employees/directory")


def parse_employee_directory(xml_content: bytes | str) -> list[dict]:
    """XML -> list of user dicts; missing/empty fields become ''
    (reference get_field, :46-52)."""
    root = ElementTree.fromstring(xml_content)
    users = []
    for emp in root.findall("./employees/employee"):
        rec = {}
        for field_id, col in BAMBOOHR_FIELDS.items():
            node = emp.find(f"./field[@id='{field_id}']")
            rec[col] = node.text if node is not None and node.text is not None else ""
        users.append(rec)
    return users


def bamboohr_users(spark: SparkSession,
                   fetch: Callable[[str], bytes | str],
                   subdomain: str) -> DataFrame:
    """Employee directory as a users DataFrame
    (email, first_name, last_name, name, team_name, role_name).

    ``fetch(url) -> xml bytes`` is the injected transport (production:
    basic-auth requests.get as in the reference, :39-41).
    """
    records = parse_employee_directory(fetch(employee_directory_uri(subdomain)))
    schema = ", ".join(f"{c} string" for c in USER_COLUMNS)
    return spark.createDataFrame(
        [tuple(r[c] for c in USER_COLUMNS) for r in records], schema)
