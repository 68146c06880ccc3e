{{ config(materialized='view') }}
SELECT c_custkey, c_nationkey, c_mktsegment FROM {{ source('stg', 'customer') }}
