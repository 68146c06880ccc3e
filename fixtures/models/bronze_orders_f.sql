{{ config(materialized='table') }}
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
FROM {{ source('stg', 'orders') }}
WHERE o_orderstatus <> 'P'
