{{ config(materialized='table') }}
SELECT c.c_mktsegment,
       COUNT(*) AS n_orders,
       CAST(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(25,6))) AS STRING)
            AS DOUBLE) AS total_price
FROM {{ ref('bronze_orders_f') }} o
JOIN {{ ref('bronze_customer_f') }} c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
